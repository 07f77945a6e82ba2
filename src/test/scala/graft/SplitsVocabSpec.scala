package graft

import org.apache.spark.sql.functions._
import graft.corpus.Splits
import graft.operators.{Dedup, TextStats}

class SplitsVocabSpec extends SparkSuite {
  import spark.implicits._

  private val fr = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)

  test("exactDupSafe: normalized-identical copies always share a split") {
    val docs = Seq(
      (1L, "The quick brown fox!"),
      (2L, "the   quick brown fox"),      // same after normalization
      (3L, "THE QUICK, BROWN FOX"),       // same after normalization
      (4L, "a different document entirely"),
      (5L, "a different document entirely")
    ).toDF("doc_id", "text")
    val got = Splits.exactDupSafe(docs, "text", "doc_id", fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got.size === 5 && got.values.forall(Set("train", "val", "test")))
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(4L) === got(5L))
  }

  test("split assignment is map-side (no shuffle) and append-stable") {
    val docs = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("doc body number "), col("id")).as("text"))
    val out = Splits.exactDupSafe(docs, "text", "doc_id", fr)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split assignment must not shuffle:\n$plan")
    // fractions roughly honored over 2000 singleton groups
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") / 2000.0 - 0.75) < 0.05)
    assert(math.abs(counts("val") / 2000.0 - 0.125) < 0.03)
    assert(math.abs(counts("test") / 2000.0 - 0.125) < 0.03)
    // append-stability: the first 500 docs keep their split in a larger corpus
    val small = Splits.exactDupSafe(
        docs.where(col("doc_id") < 500), "text", "doc_id", fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val large = out.where(col("doc_id") < 500)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(small === large)
  }

  test("blank documents stay singleton groups (no corpus-wide collapse)") {
    val docs = spark.range(200).select(col("id").as("doc_id"), lit("   ").as("text"))
    val counts = Splits.exactDupSafe(docs, "text", "doc_id", fr)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // 200 independent hash draws: all three splits should be populated
    assert(counts.keySet === Set("train", "val", "test"))
  }

  test("near-dup-safe splits compose with connected components") {
    val docs = Seq(
      (1L, "alpha"), (2L, "alpha-ish"), (3L, "alpha-like"),   // one component
      (4L, "beta"), (5L, "beta-ish"),                         // another
      (6L, "gamma")                                           // isolated
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)   // (id, label = cluster-min id)
    val keyed = docs.join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("label"), col("doc_id")))
    val got = Splits.byGroupKey(keyed, "grp", fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got(1L) === got(2L) && got(2L) === got(3L))
    assert(got(4L) === got(5L))
    assert(got.size === 6)
    // the first-class operator produces the identical assignment
    val direct = Splits.nearDupSafe(docs, "doc_id", pairs, fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(direct === got)
    intercept[IllegalArgumentException] {
      Splits.nearDupSafe(docs.withColumn("split", lit("x")), "doc_id", pairs, fr)
    }
  }

  test("NULL group keys fail loudly in-plan; NULL text falls back to a singleton group") {
    val bad = Seq((1L, null.asInstanceOf[String]), (2L, "k"))
      .toDF("id", "grp")
    val e = intercept[Exception] {
      Splits.byGroupKey(bad, "grp", fr).collect()
    }
    assert(e.getMessage.contains("NULL group key") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL group key")))
    // null text is nobody's duplicate: singleton fallback, no raise
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "real text"))
      .toDF("doc_id", "text")
    val got = Splits.exactDupSafe(docs, "text", "doc_id", fr)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got.size === 2 && got.values.forall(Set("train", "val", "test")))
  }

  test("splitExpr guards: fractions validated, last split absorbs the remainder") {
    val one = Splits.byGroupKey(Seq((1L, "k")).toDF("id", "grp"), "grp",
      Seq("all" -> 1.0))
    assert(one.select("split").as[String].collect().toSeq === Seq("all"))
    intercept[IllegalArgumentException] {
      Splits.splitExpr(lit("x"), Seq("a" -> 0.9, "b" -> 0.2))  // sums > 1
    }
    intercept[IllegalArgumentException] {
      Splits.splitExpr(lit("x"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Splits.byGroupKey(Seq((1L, "k", "x")).toDF("id", "grp", "split"), "grp", fr)
    }
  }

  test("datasheet: hand-checked per-stratum audit aggregate") {
    val docs = Seq(
      (1L, "en", "same doc text"),
      (2L, "en", "Same   doc, TEXT"),        // exact dup of 1 after normalization
      (3L, "en", "a unique document"),
      (4L, "en", "   "),                     // blank -> singleton fp, 0 tokens
      (5L, "de", "ein dokument"),
      (6L, "de", null.asInstanceOf[String])  // null text excluded entirely
    ).toDF("doc_id", "lang", "text")
    val got = TextStats.datasheet(docs, "text", "doc_id", "lang")
      .select("stratum", "n_docs", "n_tokens", "n_blank", "n_distinct_fp", "n_dup_docs")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // en: 4 docs, 3+3+3+0 tokens, 1 blank, fps = {dup-pair, unique, blank
    // singleton} = 3 distinct, 2 docs inside a dup cluster
    assert(got("en") === (("en", 4L, 9L, 1L, 3L, 2L)))
    assert(got("de") === (("de", 1L, 2L, 0L, 1L, 0L)))
  }

  test("split + soft-sample expressions run unchanged in Structured Streaming (stateless)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = in.toDF().toDF("doc_id", "text")
      .withColumn("split", Splits.splitExpr(
        graft.functions.TextFns.fingerprint(col("text")), fr))
      .where(graft.operators.Sampling.byScoreProbabilityPredicate(
        col("doc_id"), lit(1.0), seed = 3L))
    val q = out.writeStream.format("memory").queryName("splits_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, "alpha doc"), (2L, "beta doc"), (3L, "alpha doc"))
      q.processAllAvailable()
      val rows = spark.table("splits_stream")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(rows.keySet === Set(1L, 2L, 3L))     // p=1.0 keeps everything
      assert(rows(1L) === rows(3L))               // same content, same split
      // and the streaming decision equals the batch decision row for row
      val batch = Splits.exactDupSafe(
          Seq((1L, "alpha doc"), (2L, "beta doc"), (3L, "alpha doc"))
            .toDF("doc_id", "text"), "text", "doc_id", fr)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(rows === batch)
    } finally q.stop()
  }

  test("c4 / language-mix / entropy-free projections run unchanged in Structured Streaming") {
    // c4LineStats and langConsistency are pure per-row projections (zero
    // shuffles, plan-pinned) — the same stateless contract as splits and
    // soft sampling: a streaming micro-batch must produce the identical
    // rows as the batch call.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.TextStats
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "A fine sentence here today. Another follows now. Third. Fourth one lands. Fifth closes it."),
      (2L, "der die das und ist nicht ein zu mit der die das und ist nicht ein zu mit der die " +
        "the cat sat on the mat with it and that is that it is"),
      (3L, "nav crumb"))
    val in = MemoryStream[(Long, String)]
    val streamed = TextStats.langConsistency(
      TextStats.c4LineStats(in.toDF().toDF("doc_id", "text"), "text", "doc_id")
        .select(col("id").as("doc_id"), coalesce(col("cleaned"), lit("")).as("text")),
      "text", "doc_id", window = 20)
    val q = streamed.writeStream.format("memory").queryName("c4_stream")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("c4_stream")
        .select("id", "lang_pred", "n_windows", "n_foreign")
        .as[(Long, String, Long, Long)].collect().toSet
      val batch = TextStats.langConsistency(
        TextStats.c4LineStats(rows.toDF("doc_id", "text"), "text", "doc_id")
          .select(col("id").as("doc_id"), coalesce(col("cleaned"), lit("")).as("text")),
        "text", "doc_id", window = 20)
        .select("id", "lang_pred", "n_windows", "n_foreign")
        .as[(Long, String, Long, Long)].collect().toSet
      assert(got === batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("ship-a-dataset composition: release -> leakage-safe splits -> epoch mixture") {
    import graft.corpus.ReleasePipeline
    import graft.operators.Sampling
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val benchmark = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val res = ReleasePipeline.run(
      docs.where(pmod(col("doc_id"), lit(10)) =!= 0), benchmark,
      ReleasePipeline.Config(packCapacity = 256L))
    // 1. splits over the released corpus: every doc assigned to a known
    // split (the default config releases only ~18 sf0.001 docs, too few
    // to demand all three splits be non-empty — distribution accuracy is
    // pinned on 2000 groups in the map-side spec above)
    val split = Splits.exactDupSafe(res.corpus, "text", "doc_id", fr)
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")) && counts.size >= 2)
    assert(counts.values.sum === res.corpus.count())
    // 2. epoch mixture over the train split: tokens budgeted per lang
    // (train docs carry lang through the release unchanged)
    val train = split.where(col("split") === "train")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .select(col("lang"), col("doc_id"),
        graft.functions.TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
    val mixed = Sampling.epochsToBudget(train, "lang", "doc_id", "n_tokens",
      Map.empty, maxEpochs = 2, defaultBudget = 2000L)
    // every emitted (doc, epoch) is a train doc; epochs within bounds;
    // the inclusive cum<=B rule means epoch-1 tokens NEVER overshoot
    val perLang = mixed.groupBy("lang")
      .agg(sum(when(col("epoch") === 1, col("n_tokens")).otherwise(0L)).as("t1"),
        max("epoch").as("maxE"))
      .as[(String, Long, Int)].collect()
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, t1, maxE) =>
      assert(t1 <= 2000L, s"$lang epoch-1 tokens $t1 exceed the budget")
      assert(maxE >= 1 && maxE <= 2)
    }
    val trainIds = train.select("doc_id").as[Long].collect().toSet
    assert(mixed.select("doc_id").as[Long].collect().forall(trainIds))
    // 3. ship the train split as shards + manifest: the written files
    // verify against the manifest and recompose the split exactly
    val dir = java.nio.file.Files.createTempDirectory("graft-ship").toString
    val manifest = graft.corpus.Export.writeShards(
        train, "doc_id", "n_tokens", nShards = 2, dir)
      .as[(Int, Long, Long, String, Long)].collect().toSeq
    assert(manifest.map(_._2).sum === trainIds.size.toLong)
    val shipped = spark.read.parquet(dir)
    assert(shipped.select("doc_id").as[Long].collect().toSet === trainIds)
  }

  test("split-leakage audit: exact overlap is zero by construction; CC splits close near leakage") {
    val q98 = SparkEntry.queries("q98_split_leakage")(spark, sf("sf0.001"))
      .as[(String, Long, Long)].collect()
    // the fingerprint-keyed guarantee, driver-visible: NO exact dup ever
    // straddles the train boundary
    assert(q98.nonEmpty && q98.forall(_._2 === 0L))
    // near-dup pairs DO leak through fingerprint-keyed splits on this
    // corpus (that's the q98 finding) — and grouping by connected
    // component over those same pairs closes them:
    val docs = Tables(spark, sf("sf0.001"), "documents")
      .where(col("text").isNotNull && length(trim(col("text"))) > 0)
    val pairs = graft.operators.Dedup.ngramJaccardPrefixFiltered(
        docs, "text", "doc_id", n = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val comp = graft.operators.Dedup.connectedComponents(pairs)
    val keyed = docs.join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("label"), col("doc_id")))
    val sp = Splits.byGroupKey(keyed, "grp", fr)
    val crossing = sp.as("a").join(sp.as("b"),
        col("a.doc_id") < col("b.doc_id") && col("a.split") =!= col("b.split"))
      .join(pairs, col("a.doc_id") === col("id_a") && col("b.doc_id") === col("id_b"))
    assert(crossing.count() === 0L,
      "near-dup pairs must not straddle splits once grouped by component")
  }

  test("vocabulary: exact top-V under (count DESC, token ASC), scale-shaped plan") {
    val docs = Seq(
      (1L, "b b b a a c"), (2L, "a a b d"), (3L, "e e e e d")
    ).toDF("doc_id", "text")
    // counts: a=4 b=4 e=4 d=2 c=1 -> top3 by (cnt desc, tok asc) = a, b, e
    val vocab = TextStats.vocabulary(docs, "text", topV = 3)
    assert(vocab.select("token").as[String].collect().toSet === Set("a", "b", "e"))
    val plan = vocab.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocabulary cut must be a distributed top-k, not a global sort:\n$plan")
  }

  test("boilerplate lines: df >= minDf strips everywhere, below-threshold and blanks survive") {
    import graft.operators.TextStats
    // 12 docs share FOOTER (>= minDf 10); 9 share ALMOST (below); blanks stay
    val docs = ((1L to 12L).map(i => (i, s"body text $i\n\nFOOTER LINE")) ++
      (13L to 21L).map(i => (i, s"body text $i\nALMOST COMMON")) :+
      ((22L, "FOOTER LINE"))).toDF("doc_id", "text")
    val got = TextStats.removeBoilerplateLines(docs, "text", "doc_id", minDf = 10)
      .select("id", "n_removed", "scrubbed")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 1L, "body text 1\n")))      // blank line survives
    assert(got(13L) === ((13L, 0L, "body text 13\nALMOST COMMON")))
    assert(got(22L) === ((22L, 1L, "")))                  // all-furniture doc
    // trimmed-form matching: indented footer copies still count + strip
    val padded = docs.union(Seq((23L, "  FOOTER LINE  \nunique tail")).toDF("doc_id", "text"))
    val got2 = TextStats.removeBoilerplateLines(padded, "text", "doc_id", minDf = 10)
      .where(col("id") === 23L).select("n_removed", "scrubbed")
      .as[(Long, String)].collect().head
    assert(got2 === ((1L, "unique tail")))
  }

  test("c4LineStats: line keep rule edges, page-drop triggers, cleaned rebuild") {
    import graft.operators.TextStats
    val good = "First sentence here today. Second one follows. Third too. " +
      "Fourth arrives now. Fifth ends it."
    val docs = Seq(
      // passes: 5 sentences, one line kept (ends '.', >= 3 words), the
      // quote-terminated line keeps too, the short/punctless lines drop
      (1L, good + "\nnav crumb\nHe said \"stop.\"\nok."),
      (2L, good + " lorem ipsum"),                    // lorem -> fail
      (3L, good + " {code}"),                         // brace -> fail
      (4L, "One. Two. Three. Four.")                  // 4 sentences -> fail
    ).toDF("doc_id", "text")
    val out = TextStats.c4LineStats(docs, "text", "doc_id")
      .select("id", "n_lines", "n_kept", "n_sentences", "pass", "cleaned")
      .as[(Long, Long, Long, Long, Boolean, Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val d1 = out(1L)
    assert(d1._2 === 4L)                              // 4 physical lines
    // kept: the long first line + the quoted line; 'nav crumb' (no
    // terminal punct) and 'ok.' (< 3 words) drop
    assert(d1._3 === 2L)
    assert(d1._5 === true)
    assert(d1._6.get === good + "\nHe said \"stop.\"")
    assert(out(2L)._5 === false && out(2L)._6.isEmpty)  // lorem
    assert(out(3L)._5 === false && out(3L)._6.isEmpty)  // brace
    assert(out(4L)._4 === 4L && out(4L)._5 === false)   // sentence floor
  }

  test("pmiTopK: hand-checked collocation scores; support floor; no nested-loop totals") {
    import graft.operators.TextStats
    // "new york" always collocates (5/5); "hot dog" does too but below
    // the support floor; fillers keep the unigrams busy
    val docs = (
      (1L to 5L).map(i => (i, "new york")) ++
      (6L to 7L).map(i => (i, "hot dog")) ++
      (8L to 12L).map(i => (i, "the cat saw the dog"))
    ).toDF("doc_id", "text")
    val out = TextStats.pmiTopK(docs, "text", k = 10, minCount = 3)
    val rows = out.as[(String, String, Long, Double)].collect()
    val byPair = rows.map(r => (r._1, r._2) -> r).toMap
    // totals: n1 = 10+4+25 = 39 tokens, n2 = 5+2+20 = 27 bigrams;
    // new=5 york=5 pair=5
    val expNewYork = math.log10((5.0 / 27) / ((5.0 / 39) * (5.0 / 39)))
    assert(math.abs(byPair(("new", "york"))._4 - expNewYork) < 1e-12)
    assert(!byPair.contains(("hot", "dog")))        // support floor (2 < 3)
    // ranking: the two perfect 5/5 collocations tie at the top (same
    // counts -> bit-identical pmi) and the (tok_a, tok_b) tiebreak puts
    // "cat saw" first; "the"-anchored bigrams rank below both
    assert(rows.take(2).map(r => (r._1, r._2)).toSet ===
      Set(("cat", "saw"), ("new", "york")))
    assert(rows.head._1 === "cat")
    // scalar totals attach via broadcast HASH join, never a nested loop
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("pmiTopK: empty / all-blank / bigram-free corpora return empty, not NPE") {
    import graft.operators.TextStats
    // sum() over zero rows aggregates to NULL — each of these used to NPE
    // in the driver-side totals probe
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextStats.pmiTopK(empty, "text", k = 5).count() === 0L)
    val blank = Seq((1L, "   "), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(TextStats.pmiTopK(blank, "text", k = 5).count() === 0L)
    // single-token docs have unigrams but zero bigrams (n2 = 0)
    val mono = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val out = TextStats.pmiTopK(mono, "text", k = 5)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("tok_a", "tok_b", "n_pair", "pmi"))
  }

  test("oovStats: hand-checked rates; empty docs read 0.0; vocab joins broadcast") {
    val vocab = TextStats.vocabulary(
      Seq((0L, "the cat sat")).toDF("doc_id", "text"), "text", topV = 10)
    val corpus = Seq(
      (1L, "the cat sat"),            // 0/3 OOV
      (2L, "the dog ran"),            // 2/3 OOV
      (3L, "zebra quark"),            // 2/2 OOV
      (4L, "   ")                     // empty -> rate 0.0
    ).toDF("doc_id", "text")
    val got = TextStats.oovStats(corpus, "text", "doc_id", vocab)
    val rows = got.select("id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows(1L) === ((1L, 3L, 0L, 0.0)))
    assert(rows(2L)._3 === 2L && math.abs(rows(2L)._4 - 2.0 / 3) < 1e-12)
    assert(rows(3L) === ((3L, 2L, 2L, 1.0)))
    assert(rows(4L) === ((4L, 0L, 0L, 0.0)))
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocabulary must join as a broadcast:\n$plan")
  }
}
