package graft

import org.apache.spark.sql.functions._
import graft.functions.{Coordinates, TextFns, TimeFns, VectorFns}
import graft.operators.{Dedup, Similarity}

class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("hmsToDeg / dmsToDeg match astropy reference values, 5 dp") {
    val df = Seq(("4:40:17.07", "-43:33:09.0"), ("0:00:00", "0:00:00"),
      ("23:59:59.999", "-0:30:00"), ("12:00:00", "89:59:59.9"))
      .toDF("ra", "dec")
      .select(Coordinates.hmsToDeg($"ra").as("rd"), Coordinates.dmsToDeg($"dec").as("dd"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 70.07113)  // astropy: 70.071125 -> round 70.07113 (half-up)
    assert(rows(0).getDouble(1) === -43.5525)
    assert(rows(1).getDouble(0) === 0.0 && rows(1).getDouble(1) === 0.0)
    // negative-zero degrees: sign must come from the string
    assert(rows(2).getDouble(1) === -0.5)
    assert(rows(3).getDouble(1) === 89.99997)
  }

  test("mjdToTimestamp: epoch identities (F12)") {
    val df = Seq(40587.0, 60268.91521990741).toDF("mjd")
      .select(unix_micros(TimeFns.mjdToTimestamp($"mjd")).as("us"))
    val r = df.collect()
    assert(r(0).getLong(0) === 0L)
    // 60268.91521990741 MJD = 2023-11-20 21:57:55.000 (approx) — check vs direct arithmetic
    assert(r(1).getLong(0) === math.round((60268.91521990741 - 40587.0) * 86400.0 * 1e6))
  }

  test("roundToSecond is half-up at the 500ms boundary (F9)") {
    val df = Seq(1700000000499999L, 1700000000500000L, 1700000000500001L)
      .toDF("us")
      .select(unix_seconds(TimeFns.roundToSecond(timestamp_micros($"us"))).as("s"))
    val r = df.collect().map(_.getLong(0))
    assert(r.toSeq === Seq(1700000000L, 1700000001L, 1700000001L))
  }

  test("tokenCount handles blank and empty text") {
    val df = Seq("", "   ", "a b  c", "one").toDF("t")
      .select(TextFns.tokenCount($"t").as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(0, 0, 3, 1))
  }

  test("wordShingles: short docs yield one shingle; n-grams slide") {
    val df = Seq("a b c d").toDF("t").select(TextFns.wordShingles($"t", 3).as("sh"))
    assert(df.head().getSeq[String](0) === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t").select(TextFns.wordShingles($"t", 3).as("sh"))
    assert(short.head().getSeq[String](0) === Seq("a b"))
  }

  test("minhash: column expression and scalable aggregate agree") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("id", "text")
    val viaExpr = docs.select($"id",
      Dedup.minhashSignature(array_distinct(TextFns.wordShingles($"text", 2)), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaAgg = Dedup.minhashSignatures(docs, "id", TextFns.wordShingles($"text", 2), 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr === viaAgg)
    // single-pass kernel path must agree bit-for-bit with both
    val viaKernel = Dedup.minhashSignaturesGen(docs, "id", "text", 2, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaKernel === viaAgg)
  }

  test("simhash: column expression and scalable aggregate agree") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma epsilon zeta"))
      .toDF("id", "text")
    val viaExpr = docs.select($"id", Dedup.simhash64(TextFns.tokens($"text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = Dedup.simhashSignatures(docs, "id", TextFns.tokens($"text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaAgg)
    // single-pass kernel path must agree bit-for-bit with both
    val viaKernel = docs.select($"id",
        graft.functions.SketchExpressions.simhash64($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel === viaAgg)
  }

  test("sign buckets: codegen kernel and HOF expression paths agree") {
    val vecs = (0 until 8).map(i =>
      (i.toLong, (0 until 16).map(d => math.sin(i * 16 + d).toFloat).toArray))
      .toDF("id", "v")
    // withSignBucket rides the sign_bands kernel (bands = 1)
    val viaKernel = Similarity.withSignBucket(vecs, "v", "id", 6)
      .select($"id", $"__bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = vecs.select($"id", VectorFns.signBucket($"v", 6).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaKernel === viaExpr)
  }

  test("sign_bands: every band matches an independent HOF reconstruction") {
    import org.apache.spark.sql.functions._
    val bandBits = 5; val bands = 3
    val vecs = (0 until 6).map(i =>
      (i.toLong, (0 until 12).map(d => math.cos(i * 12 + d).toFloat).toArray))
      .toDF("id", "v")
    val viaKernel = vecs.select($"id",
        graft.functions.VectorExpressions.signBands($"v", bandBits, bands).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // independent reference: per-projection HOF sums (same hash-Rademacher
    // weights), packed per band in test code
    val nBits = bandBits * bands
    val projCols = (0 until nBits).map { j =>
      aggregate(
        zip_with($"v".cast("array<double>"), sequence(lit(0), size($"v") - 1),
          (x, i) => x * when(pmod(hash(i, lit(j)), lit(2)) === 0, 1.0d).otherwise(-1.0d)),
        lit(0.0d), (acc, x) => acc + x).as(s"p$j")
    }
    val viaHof = vecs.select(($"id" +: projCols): _*).collect().map { r =>
      val sums = (0 until nBits).map(j => r.getDouble(1 + j))
      r.getLong(0) -> (0 until bands).map { b =>
        (0 until bandBits).map(t =>
          if (sums(b * bandBits + t) >= 0) 1L << t else 0L).sum
      }
    }.toMap
    assert(viaKernel === viaHof)
  }

  test("cosine: known identities") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 2.0f)),
      (Array(1.0f, 1.0f), Array(2.0f, 2.0f))).toDF("a", "b")
      .select(VectorFns.cosine($"a", $"b").as("c"))
    val r = df.collect().map(_.getDouble(0))
    assert(math.abs(r(0)) < 1e-12)
    assert(math.abs(r(1) - 1.0) < 1e-12)
  }

  test("quality/punct/stopword ratios on known text") {
    val df = Seq("the cat, the hat!").toDF("t").select(
      TextFns.punctRatio($"t").as("p"),
      TextFns.stopwordRatio($"t").as("s"),
      TextFns.meanTokenLen($"t").as("m"))
    val r = df.head()
    assert(math.abs(r.getDouble(0) - 2.0 / 17.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 2.0 / 4.0) < 1e-12)
  }

  test("tokenMetrics single-pass struct agrees with individual metrics") {
    val df = Seq("the cat, the hat!", "der hund ist gross und laut", "", "  x  ")
      .toDF("t")
      .select($"t",
        TextFns.tokenMetrics(TextFns.tokens($"t")).as("m"),
        TextFns.tokenCount($"t").cast("long").as("n"),
        TextFns.stopwordRatio($"t").as("sr"),
        TextFns.meanTokenLen($"t").as("ml"),
        TextFns.langIdHeuristic($"t").as("l"))
    df.collect().foreach { r =>
      val m = r.getStruct(1)
      assert(m.getLong(0) === r.getLong(2))
      assert(math.abs(m.getDouble(1) - r.getDouble(3)) < 1e-12)
      assert(math.abs(m.getDouble(2) - r.getDouble(4)) < 1e-12)
      assert(m.getString(3) === r.getString(5))
    }
  }

  test("text_metrics kernel agrees with the composed TextFns columns") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
      .where($"text".isNotNull).limit(200)
    val rows = docs.select(
      graft.functions.TextMetricsExpr.textMetrics($"text").as("m"),
      TextFns.tokenCount($"text").cast("long").as("n"),
      TextFns.stopwordRatio($"text").as("sr"),
      TextFns.meanTokenLen($"text").as("ml"),
      TextFns.langIdHeuristic($"text").as("lang"),
      TextFns.punctRatio($"text").as("pr"),
      TextFns.qualityScore($"text").as("q")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getStruct(0)
      assert(m.getLong(0) === r.getLong(1))
      assert(m.getDouble(1) === r.getDouble(2))
      assert(m.getDouble(2) === r.getDouble(3))
      assert(m.getString(3) === r.getString(4))
      assert(m.getDouble(4) === r.getDouble(5))
      // qualityScore rounds to 6dp; kernel quality is raw
      assert(math.abs(math.rint(m.getDouble(5) * 1e6) / 1e6 - r.getDouble(6)) < 1e-12)
    }
  }

  test("langIdHeuristic picks the marker-heavy language") {
    val df = Seq("the cat and the dog is in that house",
      "der hund ist nicht ein katze und", "xyzzy qwerty").toDF("t")
      .select(TextFns.langIdHeuristic($"t").as("l"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("en", "de", "und"))
  }

  test("norm_text / word_shingles kernels agree with the composed Columns") {
    val probes = Seq("Hello,   World!", "你好 世界", "это тест", "!!! ???",
      "  padded  ", "", "a b", "one two three four five", "dup dup dup dup")
    val df = probes.toDF("t").select(
      TextFns.normalize($"t").as("norm_col"),
      graft.functions.SketchExpressions.normText($"t").as("norm_kernel"),
      array_distinct(TextFns.wordShingles($"t", 3)).as("sh_col"),
      graft.functions.SketchExpressions.wordShingles($"t", 3).as("sh_kernel"),
      sort_array(graft.functions.SketchExpressions.wordShingles($"t", 3)).as("sh_sorted"))
    df.collect().foreach { r =>
      assert(r.getString(0) === r.getString(1))
      // same shingle SET; the kernel additionally emits them binary-sorted
      // (sort_array order) for the two-pointer intersect kernel
      assert(r.getSeq[String](2).toSet === r.getSeq[String](3).toSet)
      assert(r.getSeq[String](3) === r.getSeq[String](4))
    }
    // and over the real corpus
    val docs = Tables(spark, sf("sf0.001"), "documents").where($"text".isNotNull)
    val mismatch = docs.select(
        TextFns.normalize($"text").as("a"),
        graft.functions.SketchExpressions.normText($"text").as("b"))
      .where($"a" =!= $"b").count()
    assert(mismatch === 0)
  }

  test("normalize keeps non-Latin letters; distinct docs keep distinct fingerprints") {
    val docs = Seq(
      (1L, "Hello,   World!"),
      (2L, "你好 世界"),          // Chinese survives normalization
      (3L, "это тест"),           // Cyrillic survives
      (4L, "!!! ???"),            // symbol-only -> falls back to raw text
      (5L, "@@@ ###"))            // different symbol-only -> different print
      .toDF("id", "t")
      .select($"id", TextFns.normalize($"t").as("n"), TextFns.fingerprint($"t").as("fp"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(docs(1L)._1 === "hello world")
    assert(docs(2L)._1 === "你好 世界")
    assert(docs(3L)._1 === "это тест")
    assert(docs(4L)._1 === "!!! ???")
    // all five fingerprints distinct — a non-Latin corpus never collapses
    assert(docs.values.map(_._2).toSet.size === 5)
  }

  test("exactByFingerprint never clusters whitespace-only docs") {
    val df = Seq((1L, "   "), (2L, ""), (3L, "   "), (4L, "real text here"),
      (5L, "real   text  here!")).toDF("doc_id", "text")
    val kept = graft.operators.Dedup.exactByFingerprint(df, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 4 and 5 normalize identically -> one survives; every blank row survives
    assert(kept === Set(1L, 2L, 3L, 4L))
  }

  test("encoding-damage counters: replacement chars, control leaks, clean text") {
    import graft.functions.TextFns
    val df = Seq(
      (1L, "clean text, tabs\tand\nnewlines are fine"),
      (2L, "moji�bake� here"),
      (3L, "bin\u0001ary\u0007junk"),
      (4L, "")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextFns.replacementCharCount(col("text")).as("r"),
        TextFns.controlCharCount(col("text")).as("c"),
        TextFns.encodingDamageRatio(col("text")).as("d"))
      .as[(Long, Long, Long, Double)].collect().map(x => x._1 -> x).toMap
    assert(got(1L)._2 === 0L && got(1L)._3 === 0L && got(1L)._4 === 0.0)
    assert(got(2L)._2 === 2L && got(2L)._3 === 0L)
    assert(got(3L)._2 === 0L && got(3L)._3 === 2L)
    assert(got(3L)._4 === 2.0 / 12)  // 12 chars incl. the two control bytes
    assert(got(4L)._4 === 0.0)   // empty text: no division by zero
  }
}
