package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextStats}

class SamplingStatsSpec extends SparkSuite {
  import spark.implicits._

  test("hexThreshold is the base-16 expansion of the fraction") {
    assert(Sampling.hexThreshold(0.25) === "4" + "0" * 31)
    assert(Sampling.hexThreshold(0.5)  === "8" + "0" * 31)
    assert(Sampling.hexThreshold(0.2)  === "3" * 32)
    assert(Sampling.hexThreshold(1.0)  === "f" * 32)   // floor-capped at 15
    assert(Sampling.hexThreshold(0.0)  === "0" * 32)
  }

  test("hash sample is deterministic and partition-layout independent") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.byHash(df, "id", 0.25).select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.byHash(df.repartition(13), "id", 0.25)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // within 5% of the target fraction on 10k uniform keys
    assert(math.abs(a.length / 10000.0 - 0.25) < 0.05)
  }

  test("hash sample decisions are append-stable (growing corpus)") {
    val small = Sampling.byHash(spark.range(1000).toDF("id"), "id", 0.25)
      .select("id").as[Long].collect().toSet
    val large = Sampling.byHash(spark.range(10000).toDF("id"), "id", 0.25)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(large))
    assert(large.filter(_ < 1000) === small)
  }

  test("stratified mixing: per-stratum fractions honored, defaults drop unknowns") {
    val df = spark.range(30000)
      .select(col("id"), element_at(array(lit("web"), lit("books"), lit("logs")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("src"))
    val mixed = Sampling.stratifiedByHash(df, "src", "id",
      Map("web" -> 0.3, "books" -> 1.0))   // logs absent -> default 0 -> dropped
    val counts = mixed.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("logs"))
    assert(counts("books") === 10000L)                         // keep-all stratum
    assert(math.abs(counts("web") / 10000.0 - 0.3) < 0.05)
    // per-stratum decisions match the single-stratum operator exactly
    val webOnly = Sampling.byHash(df.where(col("src") === "web"), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(mixed.where(col("src") === "web").select("id").as[Long].collect().toSet === webOnly)
    // defaultFraction applies to strata without an explicit weight
    val withDefault = Sampling.stratifiedByHash(df, "src", "id",
      Map("books" -> 1.0), defaultFraction = 0.5)
    val dcounts = withDefault.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(math.abs(dcounts("logs") / 10000.0 - 0.5) < 0.05)
    assert(math.abs(dcounts("web") / 10000.0 - 0.5) < 0.05)
  }

  test("token-budget sampling equals the defining per-stratum window cumsum") {
    // 400 docs across 3 strata with varied lengths; the bucketed
    // operator must keep EXACTLY the rows the naive global-window
    // formulation keeps (same hash order, same inclusive-prefix rule).
    val docs = (1L to 400L).map { i =>
      (i, Seq("web", "code", "books")(((i * 7) % 3).toInt), 1L + (i * 13) % 50)
    }.toDF("doc_id", "src", "len")
    val budgets = Map("web" -> 900L, "code" -> 0L)
    val got = Sampling.byTokenBudget(docs, "src", "doc_id", "len",
        budgets, defaultBudget = 300L)
      .select("doc_id").as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val budget = when(col("src") === "web", 900L)
      .when(col("src") === "code", 0L).otherwise(300L)
    val want = docs.withColumn("cum", sum("len").over(w))
      .where(col("cum") <= budget)
      .select("doc_id").as[Long].collect().toSet
    assert(got === want && got.nonEmpty)
    // zero budget drops the whole stratum; huge budget keeps it entirely
    assert(!docs.where(col("src") === "code").select("doc_id").as[Long]
      .collect().exists(got))
    val all = Sampling.byTokenBudget(docs, "src", "doc_id", "len",
      Map.empty, defaultBudget = Long.MaxValue / 4)
    assert(all.count() === 400L)
  }

  test("token-budget sampling: NULL stratum gets the default budget, not silently dropped") {
    val docs = Seq(
      (1L, null.asInstanceOf[String], 40L), (2L, null.asInstanceOf[String], 40L),
      (3L, null.asInstanceOf[String], 40L), (4L, "web", 10L))
      .toDF("doc_id", "src", "len")
    val kept = Sampling.byTokenBudget(docs, "src", "doc_id", "len",
        Map("web" -> 100L), defaultBudget = 80L)
      .select("doc_id").as[Long].collect().toSet
    // null stratum: hash order over {1,2,3}, 40 tokens each, budget 80
    // -> exactly two survive; web row fits its own budget.
    assert(kept.contains(4L) && (kept - 4L).size === 2)
  }

  test("token-budget sampling: refuses input columns in the reserved __tb_ namespace") {
    val docs = Seq((1L, "web", 10L, "x")).toDF("doc_id", "src", "len", "__tb_h")
    val e = intercept[IllegalArgumentException] {
      Sampling.byTokenBudget(docs, "src", "doc_id", "len", Map("web" -> 100L))
    }
    assert(e.getMessage.contains("__tb_"))
  }

  test("top-k by score: NULL and NaN scores are excluded, never crash the job") {
    import graft.functions.GroupSample
    val rows = Seq(
      (1L, "a", Some(5.0)), (2L, "a", Some(Double.NaN)), (3L, "a", None),
      (4L, "a", Some(7.0)), (5L, "a", Some(3.0)))
      .toDF("id", "grp", "score")
    val got = GroupSample.topKPerGroupByScore(rows, "grp", "id", "score", k = 2)
      .select("id").as[Long].collect().toSet
    assert(got === Set(4L, 1L))  // 7.0 and 5.0; NaN/NULL excluded
  }

  test("top-k by score per group equals the window rank; ties break to smaller id") {
    import graft.functions.GroupSample
    val rows = (1L to 300L).map(i =>
      (i, Seq("a", "b", "c")((i % 3).toInt), (i * 17 % 23).toDouble))
      .toDF("id", "grp", "score")
    val got = GroupSample.topKPerGroupByScore(rows, "grp", "id", "score", k = 5)
      .select("grp", "id").as[(String, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("score").desc, col("id"))
    val want = rows.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(got === want && got.size === 15)
    // k larger than any group returns everything
    assert(GroupSample.topKPerGroupByScore(rows, "grp", "id", "score", 1000)
      .count() === 300L)
  }

  test("top-ngram fraction: repeated phrase dominates; short docs degenerate to 1.0") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),              // bigram "spam spam" x4
      (2L, "one two three four five"),               // all bigrams unique
      (3L, "hi")                                      // <= n words -> whole text
    ).toDF("doc_id", "text")
    val out = TextStats.topNgramFraction(docs, "text", "doc_id", n = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((4L, 1.0)))                  // 4 identical bigrams
    assert(out(2L)._1 === 4L && math.abs(out(2L)._2 - 0.25) < 1e-12)
    assert(out(3L) === ((1L, 1.0)))
  }

  test("dup-ngram char fraction: union of overlapping windows, no double count") {
    // doc 1: "a b c a b c x" with n=3 -> "a b c" occurs at starts 0 and 3;
    // covered token positions = {0..2} U {3..5} = 6 tokens of 1 char each,
    // total chars 7 -> 6/7. Overlap case doc 2: "a a a a z" n=3 ->
    // "a a a" at starts 0,1 -> covered {0..2} U {1..3} = 4 tokens (union,
    // NOT 6), chars 4/5. doc 3: no repetition -> 0. doc 4: shorter than
    // n -> 0 with totals still reported.
    val docs = Seq(
      (1L, "a b c a b c x"),
      (2L, "a a a a z"),
      (3L, "p q r s t"),
      (4L, "hi yo")
    ).toDF("doc_id", "text")
    val out = TextStats.dupNgramCharFraction(docs, "text", "doc_id", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L)._1 === 7L && out(1L)._2 === 6L &&
      math.abs(out(1L)._3 - math.rint(6.0 / 7 * 1e6) / 1e6) < 1e-12)
    assert(out(2L) === ((5L, 4L, 0.8)))
    assert(out(3L) === ((5L, 0L, 0.0)))
    assert(out(4L) === ((4L, 0L, 0.0)))
  }

  // --- epoch-weighted mixture filling -------------------------------------

  /** The defining rule, computed naively with a per-stratum window:
    * n_epochs(d) = |{k <= maxE : (k-1)*T + cum(d) <= B}|.
    */
  private def epochsNaive(docs: org.apache.spark.sql.DataFrame,
                          budget: org.apache.spark.sql.Column,
                          maxE: Int) = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("src")
    docs.withColumn("cum", sum("len").over(w))
      .withColumn("tot", sum("len").over(wAll))
      .withColumn("ne", when(col("cum") > budget, lit(0))
        .when(col("tot") === 0L, lit(maxE))
        .otherwise(least(lit(maxE.toLong),
          floor((budget - col("cum")) / col("tot")).cast("long") + 1L)).cast("int"))
      .where(col("ne") >= 1)
      .withColumn("epoch", explode(sequence(lit(1), col("ne"))))
      .select("doc_id", "epoch")
  }

  test("epochsToBudget matches the defining inequality across all regimes") {
    val docs = spark.range(300).select(col("id").as("doc_id"),
        element_at(array(lit("web"), lit("books"), lit("wiki")),
          (pmod(col("id"), lit(3)) + 1).cast("int")).as("src"),
        (pmod(col("id"), lit(7)) + 1).cast("long").as("len"))
    // web: downsample (T ~ 400 > B=150); books: ~2.5 epochs (B=1000);
    // wiki: capped at maxEpochs (B huge).
    val budgets = Map("web" -> 150L, "books" -> 1000L, "wiki" -> 100000L)
    val got = Sampling.epochsToBudget(docs, "src", "doc_id", "len",
        budgets, maxEpochs = 4)
      .select("doc_id", "epoch").as[(Long, Int)].collect().toSet
    val budgetCol = when(col("src") === "web", 150L)
      .when(col("src") === "books", 1000L).otherwise(100000L)
    val want = epochsNaive(docs, budgetCol, 4)
      .as[(Long, Int)].collect().toSet
    assert(got === want && got.nonEmpty)
    // regime sanity: some web doc dropped entirely, some books doc has
    // epochs 1..2 but not 4, every wiki doc appears exactly 4 times
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val wikiIds = docs.where(col("src") === "wiki").select("doc_id")
      .as[Long].collect()
    assert(wikiIds.forall(byDoc.get(_).contains(4)))
    assert(docs.where(col("src") === "web").select("doc_id").as[Long]
      .collect().exists(!byDoc.contains(_)))
  }

  test("epochsToBudget: epochs are contiguous 1..n and layout-independent") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
        concat(lit("s"), pmod(col("id"), lit(4))).as("src"),
        (pmod(col("id"), lit(5)) + 1).cast("long").as("len"))
    val a = Sampling.epochsToBudget(docs, "src", "doc_id", "len",
        Map.empty, maxEpochs = 3, defaultBudget = 400L)
      .select("doc_id", "epoch").as[(Long, Int)].collect()
    val b = Sampling.epochsToBudget(docs.repartition(13), "src", "doc_id", "len",
        Map.empty, maxEpochs = 3, defaultBudget = 400L)
      .select("doc_id", "epoch").as[(Long, Int)].collect()
    assert(a.sorted.toSeq === b.sorted.toSeq)
    a.groupBy(_._1).foreach { case (_, rows) =>
      val es = rows.map(_._2).sorted.toSeq
      assert(es === (1 to es.max))                   // no gaps, no dups
    }
  }

  test("epochsToBudget with maxEpochs=1 is exactly byTokenBudget") {
    val docs = spark.range(250).select(col("id").as("doc_id"),
        concat(lit("s"), pmod(col("id"), lit(3))).as("src"),
        (pmod(col("id"), lit(9)) + 1).cast("long").as("len"))
    val viaEpochs = Sampling.epochsToBudget(docs, "src", "doc_id", "len",
        Map("s0" -> 120L), maxEpochs = 1, defaultBudget = 200L)
      .select("doc_id").as[Long].collect().toSet
    val viaBudget = Sampling.byTokenBudget(docs, "src", "doc_id", "len",
        Map("s0" -> 120L), defaultBudget = 200L)
      .select("doc_id").as[Long].collect().toSet
    assert(viaEpochs === viaBudget && viaEpochs.nonEmpty)
  }

  test("epochsToBudget: zero-token stratum replicates maxEpochs times; guards fire") {
    val docs = Seq((1L, "z", 0L), (2L, "z", 0L)).toDF("doc_id", "src", "len")
    val got = Sampling.epochsToBudget(docs, "src", "doc_id", "len",
        Map("z" -> 10L), maxEpochs = 3)
      .select("doc_id", "epoch").as[(Long, Int)].collect().toSet
    assert(got === Set((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2), (2L, 3)))
    intercept[IllegalArgumentException] {
      Sampling.epochsToBudget(docs.withColumnRenamed("len", "epoch"),
        "src", "doc_id", "epoch", Map("z" -> 1L))
    }
    intercept[IllegalArgumentException] {
      Sampling.epochsToBudget(docs, "src", "doc_id", "len", Map("z" -> 1L),
        maxEpochs = 0)
    }
  }

  test("score-proportional soft sampling: clamped, seeded, deterministic, proportional") {
    val df = spark.range(20000).toDF("id")
      .withColumn("p", (col("id") % 100) / 100.0)
    val kept = Sampling.byScoreProbability(df, "id", "p", seed = 1L)
    // keep rate tracks the mean probability (~0.495) on 20k rows
    val rate = kept.count() / 20000.0
    assert(math.abs(rate - 0.495) < 0.03, s"keep rate $rate")
    // p <= 0 never keeps, p >= 1 always keeps (clamp both ends)
    val edges = Seq((1L, -0.5), (2L, 0.0), (3L, 1.0), (4L, 7.0)).toDF("id", "p")
    val eKept = Sampling.byScoreProbability(edges, "id", "p", seed = 1L)
      .select("id").as[Long].collect().toSet
    assert(eKept === Set(3L, 4L))
    // deterministic under repartitioning; different seed, different draw
    val a = kept.select("id").as[Long].collect().toSet
    val b = Sampling.byScoreProbability(df.repartition(17), "id", "p", seed = 1L)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    val c = Sampling.byScoreProbability(df, "id", "p", seed = 2L)
      .select("id").as[Long].collect().toSet
    assert(a !== c)
  }

  // --- per-stratum top-fraction by score ----------------------------------

  test("topFractionByScore matches the defining window, ties included") {
    val docs = spark.range(400).select(col("id").as("doc_id"),
        concat(lit("g"), pmod(col("id"), lit(5))).as("src"),
        // heavy ties: only 11 distinct scores per stratum
        pmod(col("id") * 37, lit(11)).cast("double").as("score"))
    val got = Sampling.topFractionByScore(docs, "src", "doc_id", "score", 0.25)
      .select("doc_id").as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(col("score").desc, col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val want = docs.withColumn("rk", row_number().over(w))
      .withColumn("k", ceil(lit(0.25) * count(lit(1)).over(wAll)))
      .where(col("rk") <= col("k"))
      .select("doc_id").as[Long].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("percentileBuckets matches the defining window labeling, ties included") {
    val docs = spark.range(600).select(col("id").as("doc_id"),
        concat(lit("g"), pmod(col("id"), lit(4))).as("src"),
        pmod(col("id") * 13, lit(23)).cast("double").as("score"))
    val tiers = Seq("head" -> 0.25, "middle" -> 0.5, "tail" -> 0.25)
    val got = Sampling.percentileBuckets(docs, "src", "doc_id", "score", tiers)
      .select("doc_id", "tier").as[(Long, String)].collect().toMap
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(col("score").desc, col("doc_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val want = docs.withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tier",
        when(col("r") <= ceil(lit(0.25) * col("n")), "head")
          .when(col("r") <= ceil(lit(0.75) * col("n")), "middle")
          .otherwise("tail"))
      .select("doc_id", "tier").as[(Long, String)].collect().toMap
    assert(got === want && got.size === 600)
    // every row labeled exactly once, all three tiers populated per group
    assert(got.values.toSet === Set("head", "middle", "tail"))
    intercept[IllegalArgumentException] {
      Sampling.percentileBuckets(docs, "src", "doc_id", "score",
        Seq("only" -> 1.0))   // < 2 tiers
    }
    intercept[IllegalArgumentException] {
      Sampling.percentileBuckets(docs.withColumn("tier", lit("x")),
        "src", "doc_id", "score", tiers)
    }
  }

  test("topFractionByScore: all-equal-score stratum and fraction=1.0 degenerate exactly") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
        lit("only").as("src"), lit(2.5).as("score"))
    // all scores equal -> ties broken by id: the ceil(0.25*100)=25 lowest ids
    val got = Sampling.topFractionByScore(docs, "src", "doc_id", "score", 0.25)
      .select("doc_id").as[Long].collect().toSet
    assert(got === (0L until 25L).toSet)
    assert(Sampling.topFractionByScore(docs, "src", "doc_id", "score", 1.0)
      .count() === 100L)
    intercept[IllegalArgumentException] {
      Sampling.topFractionByScore(docs.withColumn("__tf_b", lit(1)),
        "src", "doc_id", "score", 0.5)
    }
  }

  test("deflate_ratio: repetition far below, hex mid-band, binary junk near 1; empty = 0") {
    import graft.functions.CompressExpr
    val rep = "lorem ipsum dolor " * 30
    // md5-chain hex (the q143 construction): ~4 bits/char, no repetition
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = (0 until 8).map { i =>
      md.digest(i.toString.getBytes).map("%02x".format(_)).mkString
    }.mkString
    // md5-chain BYTES as chars (8 bits/char where hex has 4): near 1
    val junk = (0 until 32).flatMap { i =>
      md.digest(s"junk$i".getBytes).map(b => ((b & 0x7f) + 1).toChar)
    }.mkString
    val got = Seq(("rep", rep), ("hex", hex), ("junk", junk), ("empty", ""))
      .toDF("kind", "text")
      .select(col("kind"), CompressExpr.deflateRatio(col("text")).as("r"))
      .as[(String, Double)].collect().toMap
    assert(got("rep") < 0.1, got("rep"))
    assert(got("hex") > 0.2 && got("hex") < 0.95, got("hex"))
    assert(got("junk") > 0.5, got("junk"))
    assert(got("empty") === 0.0)
  }

  test("compressionBandFilter keeps exactly the in-band rows; map-side; band guard") {
    import graft.operators.TextStats
    val docs = Seq(
      (1L, "boiler " * 100),                                    // below band
      (2L, (0 until 64).map(i => (i * 37).toHexString).mkString(" ")), // in band
      (3L, null.asInstanceOf[String])                           // null drops
    ).toDF("doc_id", "text")
    val kept = TextStats.compressionBandFilter(docs, "text", 0.2, 0.95)
    assert(kept.select("doc_id").as[Long].collect().toSeq === Seq(2L))
    assert(!kept.queryExecution.executedPlan.toString.contains("Exchange"))
    intercept[IllegalArgumentException] {
      TextStats.compressionBandFilter(docs, "text", 0.9, 0.1)
    }
  }
}
