package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** End-to-end composition of the training-data RELEASE pipeline from the
  * individual operators — the workflow a user of this library actually
  * runs before shipping a corpus:
  *
  *   PII scrub -> quality battery -> exact + near dedup ->
  *   dup-span removal -> benchmark decontamination -> LM-score floor ->
  *   sequence packing.
  *
  * Each stage is individually oracled/spec'd elsewhere; this pins that
  * they COMPOSE (column contracts line up, filters stack, the packed
  * output tiles exactly the surviving token stream).
  */
class ReleasePipelineSpec extends SparkSuite {
  import spark.implicits._

  test("scrub -> quality -> dedup -> despan -> decontaminate -> score -> pack, end to end") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
      .where(col("text").isNotNull)

    // 1. PII scrub: pure projection, row count unchanged
    val scrubbed = docs.select(col("doc_id"), col("lang"),
      Pii.redact(col("text")).as("text"))
    assert(scrubbed.count() === docs.count())

    // 2. Gopher-style quality battery
    val quality = TextStats.gopherVerdicts(scrubbed, "text", "doc_id")
      .where(col("pass")).select(col("id").as("doc_id"))
    val qualified = scrubbed.join(quality, "doc_id")
    val nQualified = qualified.count()
    assert(nQualified > 0 && nQualified <= docs.count())

    // 3. exact dedup then LSH near-dedup
    val exact = Dedup.exactByFingerprint(qualified, "text", "doc_id")
    val pairs = Dedup.minhashLshPairs(exact, "text", "doc_id",
      shingleN = 3, threshold = 0.9)
    val drops = Dedup.connectedComponents(pairs)
      .where(col("id") =!= col("label")).select("id")
    val deduped = exact.join(drops, exact("doc_id") === drops("id"), "left_anti")
    val nDeduped = deduped.count()
    assert(nDeduped > 0 && nDeduped <= nQualified)

    // 3b. exact-substring scrub (Lee et al.'s REMOVAL, not just scoring):
    // corpus-duplicated 5-token spans are cut out and the text
    // reassembled; the kept-token count must agree with the coverage
    // operator's complement (same index, score vs transform), and docs
    // scrubbed to nothing leave the stream.
    val despanned = TextStats.removeDupSpans(deduped, "text", "doc_id", k = 5)
    val expectKept = TextStats.dupSpanCoverage(deduped, "text", "doc_id", k = 5)
      .agg(sum(col("n_tokens") - col("covered_tokens"))).head().getLong(0)
    assert(despanned.agg(sum("n_kept")).head().getLong(0) === expectKept)
    val despanDocs = despanned.where(col("n_kept") > 0)
      .select(col("id").as("doc_id"), col("scrubbed").as("text"))
    val nDespanned = despanDocs.count()
    assert(nDespanned > 0 && nDespanned <= nDeduped)

    // 4. decontaminate against a benchmark (docs ending in 0 play eval)
    val clean = Decontaminate.clean(
      despanDocs.where(pmod(col("doc_id"), lit(10)) =!= 0), "text", "doc_id",
      docs.where(pmod(col("doc_id"), lit(10)) === 0), "text", n = 3)
    val nClean = clean.count()
    assert(nClean > 0)

    // 5. unigram-LM floor (drop the bottom: scores strictly below median)
    val uni = LmScore.trainUnigram(clean, "text")
    val scored = LmScore.scoreDocs(clean, "text", "doc_id", uni, oovLogp = -12.0)
    val cut = scored.agg(expr("approx_percentile(mean_logp, 0.1)")).head().getDouble(0)
    val kept = clean.join(
      scored.where(col("mean_logp") >= cut).select(col("id").as("doc_id")), "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= nClean)

    // 6. pack the survivors; spans must tile the total token stream exactly
    val sized = kept.select(col("doc_id"),
      graft.functions.TextFns.tokenCount(col("text")).cast("long").as("len"))
    val packed = Packing.packChunks(sized, "doc_id", "len", capacity = 256L)
    val rows = packed.orderBy("start_token")
      .select("start_token", "end_token").as[(Long, Long)].collect()
    val totalTokens = sized.agg(sum("len")).head().getLong(0)
    assert(rows.length === nKept)
    assert(rows.head._1 === 0L && rows.last._2 === totalTokens)
    rows.sliding(2).foreach {
      case Array((_, e), (s, _)) => assert(e === s) // gapless, no overlap
      case _ => ()
    }
  }

  test("ReleasePipeline.run: the public API composes the same workflow") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val benchmark = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val res = graft.corpus.ReleasePipeline.run(
      docs.where(pmod(col("doc_id"), lit(10)) =!= 0), benchmark,
      graft.corpus.ReleasePipeline.Config(packCapacity = 256L))
    val s = res.stats
    // counts monotone non-increasing through the filter/dedup stages;
    // the optional stages are off -> they pass everything through
    assert(s.afterNovelty === s.input)
    assert(s.afterBoilerplate === s.afterNovelty)
    assert(s.afterParaDedup === s.afterDedup)
    assert(s.input >= s.afterQuality && s.afterQuality >= s.afterDedup)
    assert(s.afterDedup >= s.afterDespan)
    assert(s.afterDespan >= s.afterDecontaminate)
    assert(s.afterDecontaminate >= s.afterLmFloor && s.afterLmFloor > 0)
    // packed spans tile the survivors' token stream exactly
    val rows = res.packed.orderBy("start_token")
      .select("start_token", "end_token").as[(Long, Long)].collect()
    assert(rows.length === s.afterLmFloor)
    val total = res.corpus.select(
        graft.functions.TextFns.tokenCount(col("text")).cast("long").as("len"))
      .agg(sum("len")).head().getLong(0)
    assert(rows.head._1 === 0L && rows.last._2 === total)
    rows.sliding(2).foreach {
      case Array((_, e), (st, _)) => assert(e === st)
      case _ => ()
    }
    // released text is actually scrubbed: no raw emails survive
    assert(res.corpus.where(col("text").rlike(
      graft.operators.Pii.rules(0)._1)).count() === 0)
  }

  test("ReleasePipeline: boilerplate-line stage strips furniture; clean-corpus parity") {
    import graft.corpus.ReleasePipeline
    val header = "ACCEPT COOKIES | Home | About | Contact"
    val footer = "(c) example.site - all rights reserved"
    val docs0 = Tables(spark, sf("sf0.001"), "documents")
      .where(col("text").isNotNull)
    // every doc wrapped in the same site furniture, plus one doc that IS
    // only furniture (must drop at stage 1b)
    val injected = docs0.select(col("doc_id"),
        concat(lit(header + "\n"), col("text"), lit("\n" + footer)).as("text"))
      .unionByName(Seq((999999L, header + "\n" + footer)).toDF("doc_id", "text"))
    val benchmark = docs0.where(pmod(col("doc_id"), lit(10)) === 0)
    val on = ReleasePipeline.run(injected, benchmark,
      ReleasePipeline.Config(boilerplateLineDedup = true, packCapacity = 256L))
    val s = on.stats
    // monotone through the new stage; the all-furniture doc drops there
    assert(s.afterBoilerplate === s.input - 1)
    assert(s.afterBoilerplate >= s.afterQuality)
    // no furniture line survives into the release
    assert(on.corpus.where(col("text").contains(header) ||
      col("text").contains(footer)).count() === 0)
    // stripping is EXACT line removal: the furniture-injected corpus with
    // the stage on releases the identical (id, text) set as the clean
    // corpus with the stage off — every downstream stage saw equal text.
    val off = ReleasePipeline.run(docs0, benchmark,
      ReleasePipeline.Config(packCapacity = 256L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(rows(on.corpus) === rows(off.corpus))
    // append side: same stage, batch-relative line df. Batch docs are
    // pairwise concatenations of real texts (Jaccard ~0.5 vs any single
    // prior doc — novel at the 0.9 dedup threshold, still English so the
    // quality battery passes them) wrapped in the same furniture, which
    // must still strip.
    val prior = on.toPrior
    val arr = docs0.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val batch = arr.indices.map { i =>
      val (idA, tA) = arr(i); val tB = arr((i + 1) % arr.length)._2
      (1000000L + idA, header + "\n" + tA + "\n" + tB)
    }.toDF("doc_id", "text")
    val app = ReleasePipeline.appendBatch(prior, batch, benchmark,
      ReleasePipeline.Config(boilerplateLineDedup = true, packCapacity = 256L))
    assert(app.stats.afterBoilerplate <= app.stats.batchInput)
    assert(app.stats.afterLmFloor > 0)
    assert(app.newKept.where(col("text").contains(header)).count() === 0)
  }

  test("all optional stages together: novelty + boilerplate + paragraph compose") {
    import graft.corpus.ReleasePipeline
    val header = "SITE NAV | cookies | subscribe"
    val docs0 = Tables(spark, sf("sf0.001"), "documents")
      .where(col("text").isNotNull)
    val injected = docs0.select(col("doc_id"),
      concat(lit(header + "\n"), col("text")).as("text"))
    val benchmark = docs0.where(pmod(col("doc_id"), lit(10)) === 0)
    val ref = docs0.where(pmod(col("doc_id"), lit(5)) === 0)
    val res = ReleasePipeline.run(
      injected.where(pmod(col("doc_id"), lit(5)) =!= 0), benchmark,
      ReleasePipeline.Config(boilerplateLineDedup = true,
        paragraphDedup = true, packCapacity = 256L),
      noveltyRef = Some(ref))
    val s = res.stats
    // full monotone chain through every optional stage
    assert(s.input >= s.afterNovelty)
    assert(s.afterNovelty >= s.afterBoilerplate)
    assert(s.afterBoilerplate >= s.afterQuality)
    assert(s.afterQuality >= s.afterDedup)
    assert(s.afterDedup >= s.afterParaDedup)
    assert(s.afterParaDedup >= s.afterDespan)
    assert(s.afterDespan >= s.afterDecontaminate)
    assert(s.afterDecontaminate >= s.afterLmFloor && s.afterLmFloor > 0)
    // furniture never survives; the paragraph pair frame is retained
    assert(res.corpus.where(col("text").contains(header)).count() === 0)
    assert(res.paraPairs.nonEmpty)
    res.minhashSig.unpersist(); res.paraPairs.foreach(_.unpersist())
  }

  test("appendBatch: a fully-redundant batch yields an empty newKept, not a crash") {
    import graft.corpus.ReleasePipeline
    val docs0 = Tables(spark, sf("sf0.001"), "documents")
      .where(col("text").isNotNull)
    val benchmark = docs0.where(pmod(col("doc_id"), lit(10)) === 0)
    val rel = ReleasePipeline.run(docs0, benchmark,
      ReleasePipeline.Config(packCapacity = 256L))
    // the same content re-delivered under fresh ids: every batch doc is
    // an exact dup of a registry fingerprint -> the whole batch drops at
    // the exact stage and the LM floor sees an empty survivor set
    val redelivered = docs0.select((col("doc_id") + 2000000L).as("doc_id"),
      col("text"))
    val app = ReleasePipeline.appendBatch(rel.toPrior, redelivered, benchmark,
      ReleasePipeline.Config(packCapacity = 256L))
    assert(app.stats.afterExact === 0L)
    assert(app.stats.afterLmFloor === 0L)
    assert(app.newKept.count() === 0L)
    // the grown release is exactly the prior
    assert(app.corpus.count() === rel.corpus.count())
  }

  test("checkpointed build resumes from completed stages and matches the in-memory run") {
    import graft.corpus.ReleasePipeline
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val benchmark = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val cand = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val cfg = ReleasePipeline.Config(packCapacity = 256L)
    def ids(r: ReleasePipeline.Result) =
      r.corpus.select("doc_id").as[Long].collect().toSet

    val plain = ReleasePipeline.run(cand, benchmark, cfg)
    val dir = java.nio.file.Files.createTempDirectory("rel_ckpt").toString
    val ckpt = ReleasePipeline.run(cand, benchmark, cfg, checkpointDir = Some(dir))
    assert(ids(ckpt) === ids(plain) && ckpt.stats === plain.stats)
    // every stage boundary materialized durably
    val stages = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(Set("1_scrub", "2_quality", "3_exact", "3_dedup", "4_despan",
      "5_decontaminate", "6_lmfloor").subsetOf(stages))

    // simulate a crash after stage 5: drop the last stage's output and
    // re-run — earlier stages are read back, only the LM floor recomputes
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete()
    }
    rmrf(new java.io.File(s"$dir/6_lmfloor"))
    val resumed = ReleasePipeline.run(cand, benchmark, cfg, checkpointDir = Some(dir))
    assert(ids(resumed) === ids(plain) && resumed.stats === plain.stats)

    // TORN write: a crash during job commit leaves a stage dir with
    // readable part-files but no _SUCCESS. Plant exactly that — and make
    // the planted data WRONG (a truncated survivor set), so if resume
    // trusted the dir the run would visibly lose documents. It must
    // instead recompute the stage and still match the in-memory run.
    rmrf(new java.io.File(s"$dir/6_lmfloor"))
    spark.read.parquet(s"$dir/5_decontaminate").limit(1)
      .write.parquet(s"$dir/6_lmfloor")
    assert(new java.io.File(s"$dir/6_lmfloor/_SUCCESS").delete())
    val healed = ReleasePipeline.run(cand, benchmark, cfg, checkpointDir = Some(dir))
    assert(ids(healed) === ids(plain) && healed.stats === plain.stats)
  }

  test("checkpoint manifest: resuming under a changed config or input fails loudly") {
    import graft.corpus.ReleasePipeline
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val benchmark = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val cand = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val cfg = ReleasePipeline.Config(packCapacity = 256L)
    val dir = java.nio.file.Files.createTempDirectory("rel_manifest").toString
    ReleasePipeline.run(cand, benchmark, cfg, checkpointDir = Some(dir))

    // changed CONFIG against the same dir: name-keyed stage outputs no
    // longer mean what this run thinks they mean -> refuse to resume
    val eCfg = intercept[IllegalStateException] {
      ReleasePipeline.run(cand, benchmark, cfg.copy(spanK = 7),
        checkpointDir = Some(dir))
    }
    assert(eCfg.getMessage.contains("DIFFERENT run"))

    // changed INPUT (one doc dropped) -> refuse
    intercept[IllegalStateException] {
      ReleasePipeline.run(cand.where(col("doc_id") =!= cand.select(min("doc_id")).head().getLong(0)),
        benchmark, cfg, checkpointDir = Some(dir))
    }

    // changed BENCHMARK -> refuse
    intercept[IllegalStateException] {
      ReleasePipeline.run(cand, benchmark.limit(3), cfg, checkpointDir = Some(dir))
    }

    // the unchanged build still resumes fine after all those refusals
    val again = ReleasePipeline.run(cand, benchmark, cfg, checkpointDir = Some(dir))
    assert(again.stats.input > 0)
  }

  test("durable stage boundaries: bounded overhead vs localCheckpoint, identical output") {
    // The 100 TB pitch for checkpointDir is "a multi-hour build dying at
    // stage 6 restarts in minutes" — that only holds if the durable
    // boundary itself is a bounded-constant-factor tax. Measure all
    // three modes here (numbers at sf0.01 live in SCALE.md §9; this
    // pins the CONTRACT at spec scale, with a deliberately loose bound
    // so scheduler noise can't flake it).
    import graft.corpus.ReleasePipeline
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val benchmark = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val cand = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val cfg = ReleasePipeline.Config(packCapacity = 256L)
    def timed(f: => ReleasePipeline.Result): (Double, Set[Long]) = {
      val t0 = System.nanoTime()
      val r = f
      val ids = r.corpus.select("doc_id").as[Long].collect().toSet
      ((System.nanoTime() - t0) / 1e9, ids)
    }
    timed(ReleasePipeline.run(cand, benchmark, cfg))  // warm the JVM paths
    val (tMem, idsMem) = timed(ReleasePipeline.run(cand, benchmark, cfg))
    val dir = java.nio.file.Files.createTempDirectory("rel_tax").toString
    val (tCold, idsCold) = timed(
      ReleasePipeline.run(cand, benchmark, cfg, checkpointDir = Some(dir)))
    val (tWarm, idsWarm) = timed(
      ReleasePipeline.run(cand, benchmark, cfg, checkpointDir = Some(dir)))
    info(f"in-memory $tMem%.2fs, durable-cold $tCold%.2fs, durable-resume $tWarm%.2fs")
    assert(idsCold === idsMem && idsWarm === idsMem)
    // durable cold build: same plan plus gzip parquet writes — a
    // constant factor, not a blowup
    assert(tCold < tMem * 5 + 5)
    // warm resume skips ALL stage compute (reads 7 small parquet dirs +
    // manifest fingerprints): must beat the in-memory build
    assert(tWarm < tMem + 2)
  }

  test("optional stages: novelty pre-filter and paragraph near-dup on planted fixtures") {
    import graft.corpus.ReleasePipeline
    // Three 16-token paragraphs (window-aligned) with healthy quality
    // signals; docs 1 and 2 share boilerplate paragraph P but are
    // globally distinct (whole-doc Jaccard ~0.3, far under the 0.9
    // doc-dedup threshold); doc 3 is fresh text.
    val P = "the quick brown fox jumps over the lazy dog while the rain falls on the hill"
    val Q = "a silver ship sails under a bright moon as a calm wind drifts across a bay"
    val R = "an old clock ticks inside an empty hall where an echo rings against an iron door"
    val S = "my green boat floats down the wide river past the tall reeds near the stone bridge"
    val docs = Seq((1L, s"$P $Q"), (2L, s"$P $R"), (3L, S)).toDF("doc_id", "text")
    val benchmark = Seq((90L, "benchmark only sentence completely unrelated tokens here"))
      .toDF("doc_id", "text")
    val base = ReleasePipeline.Config(lmFloorQuantile = 0.0)

    // paragraph near-dup ON: doc-level dedup keeps all three, then the
    // shared paragraph P links docs 1 and 2 -> greedy keep-min drops 2.
    val para = ReleasePipeline.run(docs, benchmark,
      base.copy(paragraphDedup = true))
    assert(para.stats.afterDedup === 3 && para.stats.afterParaDedup === 2)
    assert(para.corpus.select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    // same corpus with the stage off keeps all three
    val off = ReleasePipeline.run(docs, benchmark, base)
    assert(off.stats.afterParaDedup === 3)

    // novelty pre-filter: a reference release covering doc 1 verbatim
    // drops it (novelty 0); doc 2 is half-new (~0.5 >= 0.3) and doc 3
    // fully new -> both acquired.
    val ref = Seq((500L, s"$P $Q")).toDF("doc_id", "text")
    val nov = ReleasePipeline.run(docs, benchmark, base, noveltyRef = Some(ref))
    assert(nov.stats.input === 3 && nov.stats.afterNovelty === 2)
    assert(nov.corpus.select("doc_id").as[Long].collect().sorted.toSeq === Seq(2L, 3L))
  }

  test("stage 3c: exact paragraph-hash dedup cuts later copies, keeps first, drops all-copy docs") {
    import graft.corpus.ReleasePipeline
    val P = "the quick brown fox jumps over the lazy dog while the rain falls on the hill"
    val Q = "a silver ship sails under a bright moon as a calm wind drifts across a bay"
    val R = "an old clock ticks inside an empty hall where an echo rings against an iron door"
    // doc 1 carries P+Q, doc 2 repeats P (cut, R survives), doc 3 is
    // ONLY a copy of P -> drops entirely
    val docs = Seq((1L, s"$P\n\n$Q"), (2L, s"$P\n\n$R"), (3L, P))
      .toDF("doc_id", "text")
    val benchmark = Seq((90L, "benchmark only sentence completely unrelated tokens here"))
      .toDF("doc_id", "text")
    val base = ReleasePipeline.Config(lmFloorQuantile = 0.0)
    val res = ReleasePipeline.run(docs, benchmark,
      base.copy(paragraphHashDedup = true))
    assert(res.stats.afterParaDedup === 3 && res.stats.afterParaHash === 2,
      res.stats.toString)
    val byId = res.corpus.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(byId.keySet === Set(1L, 2L))
    // keep-FIRST: doc 1 retains P (with it now unique, stage 4's
    // remove-all-copies despan keeps it too); doc 2 lost its copy
    assert(byId(1L).contains("quick brown fox") && byId(1L).contains(Q))
    assert(byId(2L).contains(R) && !byId(2L).contains("quick brown fox"),
      byId(2L))
    // off by default: stage 4's REMOVE-ALL-COPIES semantics take over —
    // P vanishes from every doc (doc 3, P-only, drops) — the exact
    // contrast the keep-first stage exists for
    val off = ReleasePipeline.run(docs, benchmark, base)
    assert(off.stats.afterParaHash === off.stats.afterParaDedup)
    val offIds = off.corpus.select("doc_id").as[Long].collect().toSet
    assert(offIds === Set(1L, 2L), offIds.toString)
    assert(!off.corpus.where(col("doc_id") === 1L).head()
      .getAs[String]("text").contains("quick brown fox"))
  }

  test("pluggable budget stage: epochsToBudget composes into run(); corpus/packed untouched") {
    import graft.corpus.ReleasePipeline
    val docs = Seq(
      (1L, "a silver ship sails under a bright moon as a calm wind drifts across a bay"),
      (2L, "an old clock ticks inside an empty hall where an echo rings against an iron door"),
      (3L, "my green boat floats down the wide river past the tall reeds near the stone bridge"))
      .toDF("doc_id", "text")
    val benchmark = Seq((90L, "benchmark only sentence completely unrelated tokens here"))
      .toDF("doc_id", "text")
    val base = ReleasePipeline.Config(lmFloorQuantile = 0.0)
    // the epoch mixture as the release's budget stage: one stratum,
    // budget = 2x the total kept tokens → every doc repeats for 2 epochs
    val res = ReleasePipeline.run(docs, benchmark, base,
      budgetStage = Some(df =>
        Sampling.epochsToBudget(df.withColumn("lang", lit("en")),
          "lang", "doc_id", "n_tokens",
          Map.empty, maxEpochs = 3, defaultBudget = 16L * 3 * 2)
          .select("doc_id", "epoch")))
    assert(res.budgeted.isDefined)
    val got = res.budgeted.get.as[(Long, Int)].collect().toSet
    assert(got === Set((1L, 1), (1L, 2), (2L, 1), (2L, 2), (3L, 1), (3L, 2)),
      got.toString)
    // the budget stage never leaks into the release invariants
    assert(res.corpus.select("doc_id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L))
    assert(res.packed.select("doc_id").distinct().count() === 3)
    // knob off → no budgeted frame (the r15 surface, unchanged)
    assert(ReleasePipeline.run(docs, benchmark, base).budgeted.isEmpty)
  }
}
