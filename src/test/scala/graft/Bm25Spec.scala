package graft

import org.apache.spark.sql.functions._

import graft.operators.Bm25

class Bm25Spec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat"),
    (3L, "cat cat cat"),
    (4L, "birds fly"),
    (5L, "   "),                       // blank: never indexed
    (6L, null.asInstanceOf[String]))   // null: never indexed
    .toDF("doc_id", "text")

  test("hand-computed scores: idf, tf saturation, length normalization, tiebreak") {
    val queries = Seq((10L, "cat"), (11L, "sat mat"), (12L, "")).toDF("qid", "q")
    val got = Bm25.topK(Bm25.index(docs, "doc_id", "text"), queries,
        "qid", "q", k = 10)
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).toSeq).toMap

    // index: N = 4 docs (blank/null drop), dl = 6,3,3,2 -> avgdl = 3.5
    val n = 4.0; val avgdl = 3.5
    def w(tf: Double, df: Double, dl: Double): Double =
      math.log(1 + (n - df + 0.5) / (df + 0.5)) *
        tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // "cat": df=2 (docs 1, 3); tf=3 in doc 3 saturates above doc 1's tf=1
    assert(got(10L).map(t => (t._2, t._3)) ===
      Seq((3L, r6(w(3, 2, 3))), (1L, r6(w(1, 2, 6)))))
    // "sat mat": both terms hit doc 1 (score sums over terms), doc 2
    // matches "sat" only and ranks below despite its shorter length
    assert(got(11L).map(t => (t._2, t._3)) ===
      Seq((1L, r6(w(1, 2, 6) + w(1, 1, 6))), (2L, r6(w(1, 2, 3)))))
    // empty query: no terms, no hits
    assert(!got.contains(12L))
  }

  test("k cuts per query; rank ties break by doc_id") {
    // two docs with identical text score identically for "birds" —
    // the lower doc_id must take rank 1
    val d2 = docs.union(Seq((7L, "birds fly")).toDF("doc_id", "text"))
    val hits = Bm25.topK(Bm25.index(d2, "doc_id", "text"),
        Seq((1L, "birds")).toDF("qid", "q"), "qid", "q", k = 1)
      .select("doc_id", "rank").as[(Long, Int)].collect()
    assert(hits === Array((4L, 1)))
  }

  test("prebuilt index reuses across query batches; scoring plan broadcasts the query side") {
    val ix = Bm25.index(docs, "doc_id", "text")
    val ixTf = ix.tf.persist()
    try {
      val ixP = Bm25.Index(ixTf, ix.dl)
      val a = Bm25.topK(ixP, Seq((1L, "cat")).toDF("qid", "q"), "qid", "q", 5)
      val b = Bm25.topK(ixP, Seq((2L, "dog")).toDF("qid", "q"), "qid", "q", 5)
      assert(a.count() === 2L && b.count() === 1L)
      val plan = a.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // query terms + idf reach the tf frame as a broadcast join, and
      // the top-k is a WindowGroupLimit cut, not a global sort
      assert(plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("WindowGroupLimit"), plan)
    } finally { ixTf.unpersist(); () }
  }

  test("DiskIndex: batch appends == inline index; re-delivery skips; restart-safe; empty index") {
    val root = java.nio.file.Files.createTempDirectory("bm25_ix").toString
    val ix = new Bm25.DiskIndex(root)
    val q = Seq((1L, "cat sat")).toDF("qid", "q")
    // empty index: queries return no hits, not an error
    assert(ix.topK(spark, q, "qid", "q", 5).count() === 0L)
    val batch0 = docs.where(col("doc_id") <= 2L)
    val batch1 = docs.where(col("doc_id") > 2L)
    assert(ix.append(batch0, "doc_id", "text", 0L))
    assert(ix.append(batch1, "doc_id", "text", 1L))
    // the stored index answers exactly like the inline index over the
    // union — df/idf/avgdl reflect the WHOLE index after each append
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val want = rows(Bm25.topK(docs, q, "doc_id", "text", "qid", "q", 5))
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === want)
    // re-delivered batch id: skipped, index unchanged
    assert(!ix.append(batch0, "doc_id", "text", 0L))
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === want)
    // a fresh handle on the same root (restart) reads the same index
    assert(rows(new Bm25.DiskIndex(root).topK(spark, q, "qid", "q", 5)) === want)
  }

  test("DiskIndex: streaming foreachBatch ingest + compaction keep queries invariant") {
    val landing = java.nio.file.Files.createTempDirectory("bm25_land").toString
    val cp = java.nio.file.Files.createTempDirectory("bm25_cp").toString
    val ix = new Bm25.DiskIndex(
      java.nio.file.Files.createTempDirectory("bm25_six").toString)
    val q = Seq((1L, "cat sat")).toDF("qid", "q")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    def drain(): Unit = {
      val s = spark.readStream.schema("doc_id LONG, text STRING")
        .option("recursiveFileLookup", "true").parquet(landing)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          ix.append(b, "doc_id", "text", id); ()
        }
        .start()
      s.awaitTermination(120000)
    }
    docs.where(col("doc_id") <= 2L).select("doc_id", "text")
      .write.parquet(s"$landing/p1")
    drain()
    docs.where(col("doc_id") > 2L).select("doc_id", "text")
      .write.parquet(s"$landing/p2")
    drain()
    val want = rows(Bm25.topK(docs, q, "doc_id", "text", "qid", "q", 5))
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === want)
    // restart with no new files: re-delivers nothing, index unchanged
    drain()
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === want)
    // compaction: one postings directory, identical retrieval
    assert(ix.compact(spark))
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === want)
  }

  test("DiskIndex compaction artifacts: dl/stats match recomputation; tail merge; crash degrade") {
    val root = java.nio.file.Files.createTempDirectory("bm25_aux").toString
    val ix = new Bm25.DiskIndex(root)
    val q = Seq((1L, "cat sat")).toDF("qid", "q")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    assert(ix.append(docs.where(col("doc_id") <= 2L), "doc_id", "text", 0L))
    assert(ix.append(docs.where(col("doc_id") > 2L), "doc_id", "text", 1L))
    val want = rows(Bm25.topK(docs, q, "doc_id", "text", "qid", "q", 5))
    assert(ix.compact(spark))
    // artifacts exist for the watermark generation and equal a fresh
    // full-tf recomputation
    val w = ix.store.compactionWatermark(spark).get
    val dlArt = spark.read.parquet(s"$root/dl/upto=$w")
      .as[(Long, Long)].collect().toSet
    val dlWant = ix.store.read(spark).groupBy("doc_id")
      .agg(sum("tf").as("dl")).as[(Long, Long)].collect().toSet
    assert(dlArt === dlWant)
    val st = spark.read.parquet(s"$root/stats/upto=$w").head()
    assert(st.getLong(0) === dlWant.size.toLong)
    assert(st.getLong(1) === dlWant.toSeq.map(_._2).sum)
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === want)
    // appends AFTER compaction: artifact + tail merge answers exactly
    // like an inline index over the union
    val extra = Seq((100L, "the cat sat on another cat mat")).toDF("doc_id", "text")
    assert(ix.append(extra, "doc_id", "text", 2L))
    val wantGrown = rows(Bm25.topK(docs.select("doc_id", "text").unionByName(extra),
      q, "doc_id", "text", "qid", "q", 5))
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === wantGrown)
    // crash simulation: aux marker missing for the current generation →
    // serving degrades to derive-from-tf, identical results
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    assert(ix.compact(spark))
    val w2 = ix.store.compactionWatermark(spark).get
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/_aux/$w2"), false)
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === wantGrown)
    // superseded artifact generations were reclaimed by the 2nd compact
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/dl/upto=$w")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/stats/upto=$w")))
  }

  test("topKMaxScore == topK exactly: hand case where pruning certainly fires") {
    // 'rare' appears in one doc, 'common' in every doc: UB(common) is
    // tiny vs the θ seeded from 'rare', so 'common' is non-essential
    // for the mixed query and its postings join only candidates —
    // results must still be byte-identical
    val corpus = ((1L to 100L).map(i => (i, s"common filler$i text")) :+
      (200L, "rare common signal")).toDF("doc_id", "text")
    val qs = Seq((1L, "rare common"), (2L, "common"), (3L, "rare"),
      (4L, "absentterm"), (5L, null.asInstanceOf[String])).toDF("qid", "q")
    val ix = Bm25.index(corpus, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    for (k <- Seq(1, 3, 50)) {
      val a = rows(Bm25.topK(ix, qs, "qid", "q", k))
      val b = rows(Bm25.topKMaxScore(ix, qs, "qid", "q", k))
      assert(a === b, s"k=$k")
    }
    assert(rows(Bm25.topKMaxScore(ix, qs, "qid", "q", 1))
      .filter(_._1 == 1L).map(_._2) === Set(200L))
  }

  test("topKMaxScore == topK on randomized corpora, queries, k, params") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "rareone", "raretwo")
    for (trial <- 0 until 4) {
      val nDocs = 20 + rnd.nextInt(60)
      val corpus = (1L to nDocs.toLong).map { i =>
        val len = 3 + rnd.nextInt(12)
        // skewed draw: low indices common, high indices rare
        val words = Seq.fill(len)(
          vocab(math.min(vocab.size - 1,
            (math.abs(rnd.nextGaussian()) * 3).toInt)))
        (i, words.mkString(" "))
      }.toDF("doc_id", "text")
      val qs = (1L to 6L).map { q =>
        val len = 1 + rnd.nextInt(4)
        (q, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("qid", "q")
      val ix = Bm25.index(corpus, "doc_id", "text")
      val k = 1 + rnd.nextInt(8)
      val p = Bm25.Params(k1 = 0.8 + rnd.nextDouble(), b = rnd.nextDouble())
      val a = Bm25.topK(ix, qs, "qid", "q", k, p)
        .select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      val b = Bm25.topKMaxScore(ix, qs, "qid", "q", k, p)
        .select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(a === b, s"trial=$trial k=$k")
    }
  }

  test("DiskIndex term bucketing: partitioned layout, file-pruned scoring scan, results invariant") {
    val root = java.nio.file.Files.createTempDirectory("bm25_bkt").toString
    val ix = new Bm25.DiskIndex(root, termBuckets = 8)
    val q = Seq((1L, "cat sat")).toDF("qid", "q")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    assert(ix.append(docs.where(col("doc_id") <= 2L), "doc_id", "text", 0L))
    assert(ix.append(docs.where(col("doc_id") > 2L), "doc_id", "text", 1L))
    val want = rows(Bm25.topK(docs, q, "doc_id", "text", "qid", "q", 5))
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === want)
    // on-disk layout: bucket=<b> partition dirs inside each batch dir
    val b0 = new java.io.File(s"$root/tf/data/batch=0").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName)
    assert(b0.nonEmpty, "batch dir is not bucket-partitioned")
    // the scoring read carries a partition filter on bucket — the scan
    // prunes non-query buckets at FILE level
    val plan = ix.scoringTf(spark, q, "q").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    // compaction preserves the layout and the answers (+ artifacts)
    assert(ix.compact(spark))
    val cw = ix.store.compactionWatermark(spark).get
    val cb = new java.io.File(s"$root/tf/compact/upto=$cw").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName)
    assert(cb.nonEmpty, "compaction dir is not bucket-partitioned")
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === want)
    // appends after compaction: artifact + tail + pruning still exact
    val extra = Seq((100L, "the cat sat on another cat mat")).toDF("doc_id", "text")
    assert(ix.append(extra, "doc_id", "text", 2L))
    val wantGrown = rows(Bm25.topK(
      docs.select("doc_id", "text").unionByName(extra),
      q, "doc_id", "text", "qid", "q", 5))
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === wantGrown)
  }

  test("streamingWriter: scheduled compaction from the maintenance path; crash windows never degrade to wrong results") {
    val landing = java.nio.file.Files.createTempDirectory("bm25_swl").toString
    val cp = java.nio.file.Files.createTempDirectory("bm25_swc").toString
    val root = java.nio.file.Files.createTempDirectory("bm25_swi").toString
    val ix = new Bm25.DiskIndex(root, termBuckets = 4)
    val q = Seq((1L, "cat sat")).toDF("qid", "q")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    def drain(): Unit = {
      val s = spark.readStream.schema("doc_id LONG, text STRING")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1") // one landing file per batch id
        .parquet(landing)
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch(ix.streamingWriter("doc_id", "text", compactEvery = 2))
        .start()
      s.awaitTermination(120000)
    }
    docs.where(col("doc_id") <= 2L).select("doc_id", "text")
      .write.parquet(s"$landing/p0")
    docs.where(col("doc_id") > 2L).select("doc_id", "text")
      .write.parquet(s"$landing/p1")
    drain() // batch ids 0, 1 → compaction fires after id 1
    val fsys = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    val w = ix.store.compactionWatermark(spark)
    assert(w.nonEmpty, "scheduled compaction did not run")
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$root/_aux/${w.get}")),
      "scheduled compaction did not materialize artifacts")
    val want = rows(Bm25.topK(docs, q, "doc_id", "text", "qid", "q", 5))
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === want)
    assert(rows(ix.topKMaxScore(spark, q, "qid", "q", 5)) === want)
    // restart with no new files: nothing re-appends, schedule stable
    drain()
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === want)
    // CRASH WINDOW 1: compaction died between the store's _compacted
    // marker and the dl/stats artifacts — watermark advanced, no _aux
    // for it. Simulate by appending + store-compacting WITHOUT the
    // artifact step; queries must degrade to derive-from-tf, not to
    // wrong results.
    val extra = Seq((100L, "the cat sat on another cat mat")).toDF("doc_id", "text")
    assert(ix.append(extra, "doc_id", "text", 7L))
    assert(ix.store.compact(spark, force = true))
    val w2 = ix.store.compactionWatermark(spark).get
    assert(w2 > w.get)
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$root/_aux/$w2")),
      "test precondition: no artifacts for the crashed generation")
    val wantGrown = rows(Bm25.topK(
      docs.select("doc_id", "text").unionByName(extra),
      q, "doc_id", "text", "qid", "q", 5))
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === wantGrown)
    assert(rows(ix.topKMaxScore(spark, q, "qid", "q", 5)) === wantGrown)
    // recovery: the next maintenance compact() re-materializes artifacts
    // for a fresh generation (a new batch makes compact() non-trivial)
    assert(ix.append(
      Seq((101L, "mat mat cat")).toDF("doc_id", "text"), "doc_id", "text", 8L))
    assert(ix.compact(spark))
    val w3 = ix.store.compactionWatermark(spark).get
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$root/_aux/$w3")))
    val wantFinal = rows(Bm25.topK(
      docs.select("doc_id", "text").unionByName(extra)
        .unionByName(Seq((101L, "mat mat cat")).toDF("doc_id", "text")),
      q, "doc_id", "text", "qid", "q", 5))
    assert(rows(ix.topK(spark, q, "qid", "q", 5)) === wantFinal)
  }

  test("DiskIndex.topKMaxScore: bucket pruning composes with the term split; results invariant") {
    // 'rare9' appears once; pick a common term whose bucket differs from
    // rare9's (dynamically — bucket = pmod(xxhash64(term), 8)), so the
    // essential scan's file filter must be STRICTLY smaller than the
    // query vocabulary's bucket set when the common term prunes away
    def bucketOf(t: String): Long = Seq(t).toDF("term")
      .select(pmod(xxhash64(col("term")), lit(8L))).head().getLong(0)
    val rare = "rare9"
    val common = (0 until 64).map(i => s"common$i")
      .find(c => bucketOf(c) != bucketOf(rare)).get
    val corpus = ((1L to 100L).map(i => (i, s"$common filler$i text")) :+
      (200L, s"$rare $common signal")).toDF("doc_id", "text")
    val qs = Seq((1L, s"$rare $common")).toDF("qid", "q")
    val root = java.nio.file.Files.createTempDirectory("bm25_bms").toString
    val ix = new Bm25.DiskIndex(root, termBuckets = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    // empty index: no hits, no error
    assert(ix.topKMaxScore(spark, qs, "qid", "q", 5).count() === 0L)
    assert(ix.append(corpus.where(col("doc_id") <= 50L), "doc_id", "text", 0L))
    assert(ix.compact(spark)) // artifacts + bucket layout mid-lifecycle
    assert(ix.append(corpus.where(col("doc_id") > 50L), "doc_id", "text", 1L))
    for (k <- Seq(1, 3)) {
      val want = rows(Bm25.topK(corpus, qs, "doc_id", "text", "qid", "q", k))
      assert(rows(ix.topKMaxScore(spark, qs, "qid", "q", k)) === want, s"k=$k")
      // stage instrumentation: with k=1 the common term is non-essential
      // (UB(common) << θ from rare9's single posting), so the essential
      // scan's bucket filter shrank below the query vocabulary's. The
      // compacted generation carries the tstats IMPACT artifact, so the
      // term-stats stage is a metadata lookup ("tstats") — NO postings
      // scan ("df") happens for the split at all
      val b = ix.lastStageBuckets
      assert(!b.contains("df"),
        s"df postings scan ran despite a current tstats artifact: $b")
      assert(b("ess").subsetOf(b("tstats")), b.toString)
      assert(b("non").subsetOf(b("tstats")), b.toString)
      if (k == 1) {
        assert(b("ess") === Set(bucketOf(rare)), b.toString)
        assert(b("non") === Set(bucketOf(common)), b.toString)
        assert(b("ess").size < b("tstats").size, b.toString)
        assert(b("seed") === Set(bucketOf(rare)), b.toString)
      }
    }
    // the stage scans carry bucket partition filters (file-level prune)
    val plan = ix.topKMaxScore(spark, qs, "qid", "q", 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
  }

  test("tstats impact artifact: content matches recomputation; tight UB stays exact on randomized stores") {
    // content: (df, max_tf, min_dl) per term == a fresh full recompute
    val root = java.nio.file.Files.createTempDirectory("bm25_tst").toString
    val ix = new Bm25.DiskIndex(root, termBuckets = 4)
    assert(ix.append(docs.where(col("doc_id") <= 2L), "doc_id", "text", 0L))
    assert(ix.append(docs.where(col("doc_id") > 2L), "doc_id", "text", 1L))
    assert(ix.compact(spark))
    val w = ix.store.compactionWatermark(spark).get
    val art = spark.read.parquet(s"$root/tstats/upto=$w")
      .select("term", "df", "max_tf", "min_dl")
      .as[(String, Long, Long, Long)].collect().toSet
    val full = ix.read(spark)
    val want = full.tf.join(full.dl, "doc_id").groupBy("term")
      .agg(count(lit(1)).as("df"), max("tf").as("max_tf"),
        min("dl").as("min_dl"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(art === want)
    // randomized: bucketed store, compaction at a random batch boundary,
    // random k/params — the artifact-backed tight-UB route must equal
    // the inline unpruned index exactly (artifact + tail-merge paths)
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "rareone", "raretwo", "rarethree")
    for (trial <- 0 until 3) {
      val nDocs = 30 + rnd.nextInt(50)
      val corpus = (1L to nDocs.toLong).map { i =>
        val len = 3 + rnd.nextInt(10)
        (i, Seq.fill(len)(vocab(math.min(vocab.size - 1,
          (math.abs(rnd.nextGaussian()) * 3).toInt))).mkString(" "))
      }.toDF("doc_id", "text")
      val qs = (1L to 5L).map { q =>
        (q, Seq.fill(1 + rnd.nextInt(4))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }.toDF("qid", "q")
      val r2 = java.nio.file.Files.createTempDirectory(s"bm25_tsr$trial").toString
      val dix = new Bm25.DiskIndex(r2, termBuckets = 1 + rnd.nextInt(6))
      val cut = 1 + rnd.nextInt(nDocs - 1)
      assert(dix.append(corpus.where(col("doc_id") <= cut), "doc_id", "text", 0L))
      assert(dix.compact(spark))
      if (cut < nDocs) // tail after the artifact generation
        assert(dix.append(corpus.where(col("doc_id") > cut), "doc_id", "text", 1L))
      val k = 1 + rnd.nextInt(6)
      val p = Bm25.Params(k1 = 0.8 + rnd.nextDouble(), b = rnd.nextDouble())
      val ixInline = Bm25.index(corpus, "doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "doc_id", "score", "rank")
          .as[(Long, Long, Double, Int)].collect().toSet
      val want2 = rows(Bm25.topK(ixInline, qs, "qid", "q", k, p))
      assert(rows(dix.topKMaxScore(spark, qs, "qid", "q", k, p)) === want2,
        s"trial=$trial k=$k cut=$cut")
      assert(!dix.lastStageBuckets.contains("df"),
        s"trial=$trial: df scan ran despite artifact")
    }
  }

  test("tstats missing for a current generation (pre-artifact index): exact fallback via the df scan") {
    // an index compacted by an older build can carry a valid _aux
    // marker with dl/stats but NO tstats dir — topKMaxScore must fall
    // back to the aggregate-over-scan path, never misread or crash
    val root = java.nio.file.Files.createTempDirectory("bm25_old").toString
    val ix = new Bm25.DiskIndex(root, termBuckets = 4)
    val q = Seq((1L, "cat sat")).toDF("qid", "q")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    assert(ix.append(docs.where(col("doc_id") <= 2L), "doc_id", "text", 0L))
    assert(ix.append(docs.where(col("doc_id") > 2L), "doc_id", "text", 1L))
    assert(ix.compact(spark))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/tstats"), true)
    val want = rows(Bm25.topK(docs, q, "doc_id", "text", "qid", "q", 5))
    assert(rows(ix.topKMaxScore(spark, q, "qid", "q", 5)) === want)
    // the fallback ran the postings-scan df stage (no tstats lookup)
    assert(ix.lastStageBuckets.contains("df"), ix.lastStageBuckets.toString)
    assert(!ix.lastStageBuckets.contains("tstats"), ix.lastStageBuckets.toString)
  }

  test("compaction clusters postings term-asc/tf-desc per file; term pushdown skips row groups") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // tiny parquet row groups so ONE compacted file holds many of them —
    // the unit the term min/max stats skip at
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hc.get("parquet.block.size"))
    val oldCheck = Option(hc.get("parquet.block.size.row.check.min"))
    hc.setInt("parquet.block.size", 4096)
    hc.setInt("parquet.block.size.row.check.min", 50)
    try {
      def bucketOf(t: String): Long = Seq(t).toDF("term")
        .select(pmod(xxhash64(col("term")), lit(2L))).head().getLong(0)
      // three terms COLLIDING in one bucket: the bucket partition filter
      // cannot separate them — only the term IN pushdown over the
      // clustered layout can, at row-group granularity
      val terms3 = (0 until 64).map(i => s"term$i")
        .filter(t => bucketOf(t) == 0L).take(3)
      assert(terms3.size === 3)
      val corpus = terms3.zipWithIndex.flatMap { case (t, ti) =>
        (0 until 2000).map { i =>
          (ti * 2000L + i, Seq.fill(i % 5 + 1)(t).mkString(" "))
        }
      }.toDF("doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("bm25_rg").toString
      val ix = new Bm25.DiskIndex(root, termBuckets = 2)
      assert(ix.append(corpus, "doc_id", "text", 0L))
      assert(ix.compact(spark))
      val w = ix.store.compactionWatermark(spark).get
      // (1) physical clustering: within every compacted file, rows are
      // term-ascending, tf-descending within term
      val stored = spark.read.parquet(s"$root/tf/compact/upto=$w")
        .select(col("_metadata.file_path").as("f"),
          col("_metadata.row_index").as("i"), col("term"), col("tf"))
        .as[(String, Long, String, Long)].collect()
      assert(stored.length === 6000)
      for ((_, rs) <- stored.groupBy(_._1)) {
        val inFileOrder = rs.sortBy(_._2).map(r => (r._3, r._4)).toSeq
        val clustered = inFileOrder.sortBy { case (t, tf) => (t, -tf) }
        assert(inFileOrder === clustered, "file not term-asc/tf-desc clustered")
      }
      // (2) row-group skip: scanning ONE term's postings must emit far
      // fewer rows from the parquet reader than the bucket holds (the
      // pushed IN predicate + per-row-group term min/max skip the other
      // terms' groups; without the clustered layout every group spans
      // all terms and nothing skips)
      val q = Seq((1L, terms3.head)).toDF("qid", "q")
      val scan = ix.scoringTf(spark, q, "q")
      assert(scan.collect().length === 2000)
      val emitted = scan.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.metrics("numOutputRows").value }.sum
      assert(emitted < 4000,
        s"scan emitted $emitted of 6000 bucket rows — row groups not skipped")
      val plan = scan.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") &&
        (plan.contains("In(term") || plan.contains("EqualTo(term")), plan)
    } finally {
      oldBlock.fold(hc.unset("parquet.block.size"))(
        hc.set("parquet.block.size", _))
      oldCheck.fold(hc.unset("parquet.block.size.row.check.min"))(
        hc.set("parquet.block.size.row.check.min", _))
    }
  }

  test("max-score stage scans carry the pruned bucket sets as literal partition filters (plan-proven)") {
    // closes the instrumented-vs-plan-proven gap: lastStageBuckets says
    // what the builder INTENDED; this pins that the executed plan's
    // scans really carry those bucket sets as partition filters
    def bucketOf(t: String): Long = Seq(t).toDF("term")
      .select(pmod(xxhash64(col("term")), lit(8L))).head().getLong(0)
    val rare = "rare9"
    val common = (0 until 64).map(i => s"common$i")
      .find(c => bucketOf(c) != bucketOf(rare)).get
    val corpus = ((1L to 100L).map(i => (i, s"$common filler$i text")) :+
      (200L, s"$rare $common signal")).toDF("doc_id", "text")
    val qs = Seq((1L, s"$rare $common")).toDF("qid", "q")
    val root = java.nio.file.Files.createTempDirectory("bm25_ppf").toString
    val ix = new Bm25.DiskIndex(root, termBuckets = 8)
    assert(ix.append(corpus, "doc_id", "text", 0L))
    assert(ix.compact(spark))
    val out = ix.topKMaxScore(spark, qs, "qid", "q", 1)
    out.collect()
    val b = ix.lastStageBuckets
    assert(b("ess") === Set(bucketOf(rare)) &&
      b("non") === Set(bucketOf(common)), b.toString)
    // the seed/tstats stages hide behind localCheckpoints; the FINAL
    // plan contains the ess and non postings scans — each must show a
    // PartitionFilters set equal to its stage's pruned buckets
    def bucketsIn(line: String): Set[Long] =
      "\\d+".r.findAllIn(line.replaceAll("#\\d+L?", "#"))
        .map(_.toLong).toSet
    val pf = out.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PartitionFilters: ["))
      .map { l => // the [...] span of the partition filters only
        val from = l.indexOf("PartitionFilters: [")
        bucketsIn(l.substring(from, l.indexOf("]", from) max from))
      }
      .toSeq
    assert(pf.exists(_ === b("ess")),
      s"no scan pinned to the ess buckets ${b("ess")}: $pf")
    assert(pf.exists(_ === b("non")),
      s"no scan pinned to the non buckets ${b("non")}: $pf")
  }

  test("evaluateRuns: hand-computed nDCG/MRR, k cut, no-judgment and no-hit queries") {
    // q1: hits at ranks 1 (rel 2), 3 (rel 1); one judged doc (rel 1)
    //     never retrieved. n_rel = 3.
    //     dcg  = 3/log2(2) + 1/log2(4) = 3 + 0.5 = 3.5
    //     idcg = 3/log2(2) + 1/log2(3) + 1/log2(4)
    //     mrr  = 1/1
    // q2: no relevant hit in the run; judged docs exist -> ndcg 0, mrr 0
    // q3: run rows but NO judgments at all -> n_rel 0, both 0
    val runs = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 11), // rank 11 > k cut
      (2L, 20L, 1),
      (3L, 30L, 1)
    ).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      (1L, 10L, 2), (1L, 12L, 1), (1L, 99L, 1),
      (1L, 13L, 2),          // judged, but its hit is beyond the k cut
      (1L, 11L, 0),          // explicit not-relevant judgment: ignored
      (2L, 21L, 1)
    ).toDF("query_id", "doc_id", "rel")
    val got = Bm25.evaluateRuns(runs, qrels, k = 10)
      .orderBy("query_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    val idcg = 3.0 / 1.0 + 3.0 / (math.log(3) / math.log(2)) +
      1.0 / 2.0 + 1.0 / (math.log(5) / math.log(2))
    val wantNdcg = BigDecimal(3.5 / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      (1L, 4L, 1.0, wantNdcg),
      (2L, 1L, 0.0, 0.0),
      (3L, 0L, 0.0, 0.0)))
    intercept[IllegalArgumentException] { Bm25.evaluateRuns(runs, qrels, 0) }
  }

  test("evaluateRuns agrees with a local reference on randomized runs/qrels") {
    val rnd = new scala.util.Random(146L)
    val k = 5
    val queries = (1L to 12L).toSeq
    val runs = queries.flatMap { q =>
      // ranks 1..n for n in [0, 8] (ranks beyond k exercise the cut)
      (1 to rnd.nextInt(9)).map(r => (q, rnd.nextInt(30).toLong, r))
    }
    val qrels = queries.flatMap { q =>
      (0 until rnd.nextInt(6)).map(_ =>
        (q, rnd.nextInt(30).toLong, rnd.nextInt(3))) // rel 0 rows too
    }.distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (q, doc)
    def log2(x: Double) = math.log(x) / math.log(2)
    val relOf = qrels.filter(_._3 > 0).map(t => (t._1, t._2) -> t._3).toMap
    val byQ = relOf.keys.groupBy(_._1)
    val want = runs.map(_._1).distinct.sorted.map { q =>
      val hits = runs.filter(t => t._1 == q && t._3 <= k)
      val dcg = hits.map(t => relOf.get((q, t._2))
        .map(r => (math.pow(2, r) - 1) / log2(t._3 + 1)).getOrElse(0.0)).sum
      val rels = byQ.getOrElse(q, Nil).toSeq.map(p => (relOf(p), p._2))
        .sortBy(t => (-t._1, t._2)).take(k)
      val idcg = rels.zipWithIndex
        .map { case ((r, _), i) => (math.pow(2, r) - 1) / log2(i + 2) }.sum
      val nRel = byQ.get(q).map(_.size.toLong).getOrElse(0L)
      val mrr = hits.filter(t => relOf.contains((q, t._2))).map(1.0 / _._3)
        .maxOption.getOrElse(0.0)
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (q, nRel, r6(mrr), r6(if (idcg > 0) dcg / idcg else 0.0))
    }
    val got = Bm25.evaluateRuns(
        runs.toDF("query_id", "doc_id", "rank"),
        qrels.toDF("query_id", "doc_id", "rel"), k)
      .orderBy("query_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) === want.map(_._1))
    got.zip(want).foreach { case (g, w) =>
      assert(g._2 === w._2, s"n_rel q${g._1}")
      assert(math.abs(g._3 - w._3) < 2e-6, s"mrr q${g._1}: ${g._3} vs ${w._3}")
      assert(math.abs(g._4 - w._4) < 2e-6, s"ndcg q${g._1}: ${g._4} vs ${w._4}")
    }
  }

  test("theta tf-floor pushdown: the candidate scan emits fewer rows than the term-IN-only scan; results stay exact") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // tiny parquet row groups so the tf-desc clustering yields many
    // groups per term — the unit the pushed tf floor skips at
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hc.get("parquet.block.size"))
    val oldCheck = Option(hc.get("parquet.block.size.row.check.min"))
    hc.setInt("parquet.block.size", 4096)
    hc.setInt("parquet.block.size.row.check.min", 50)
    try {
      // a TALL postings list: 1000 of 3000 docs carry "hot" with tf
      // cycling 1..99 (~10 docs per tf value); every doc also carries
      // the corpus-wide "pad" (the NON-ESSENTIAL query term the floored
      // candidate set prunes the probe of), and unique filler pads
      // every doc to dl = 100 so min_dl = 100 and the floor inversion
      // is tight. df(hot) = 1000 of N = 3000 keeps idf large enough
      // that θ = w(tf=99) forces floor ≈ 99 — the candidate scan should
      // emit only the leading (high-tf) row groups of hot's postings.
      val corpus = (0 until 3000).map { i =>
        val tf = if (i < 1000) i % 99 + 1 else 0
        val filler = s"filler$i " * (99 - tf)
        (i.toLong, ("hot " * tf) + filler + "pad")
      }.toDF("doc_id", "text")
      val qs = Seq((1L, "hot pad")).toDF("qid", "q")
      val root = java.nio.file.Files.createTempDirectory("bm25_floor").toString
      val ix = new Bm25.DiskIndex(root, termBuckets = 2)
      assert(ix.append(corpus, "doc_id", "text", 0L))
      assert(ix.compact(spark)) // clusters tf-desc + tstats artifact
      val out = ix.topKMaxScore(spark, qs, "qid", "q", 3)
      val got = out.collect() // finalize the adaptive plan on OUT itself
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
          r.getAs[Double]("score"), r.getAs[Int]("rank"))).toSet
      // exactness first: identical to the floor-free inline reference
      val want = Bm25.topK(corpus, qs, "doc_id", "text", "qid", "q", 3)
        .select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      assert(got === want)
      assert(ix.lastStageBuckets.contains("cand"),
        s"floor stage never ran: ${ix.lastStageBuckets}")
      // the executed plan carries BOTH postings scans: the candidate
      // scan (term = hot AND tf >= floor pushed) and the scoring scan
      // (term IN only) — the floor must have skipped the low-tf tail.
      // Walk through the AQE wrappers to the materialized stages.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
        case q: QueryStageExec => allScans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(allScans)
      }
      val scans = allScans(out.queryExecution.executedPlan)
        .filter(_.metadata.getOrElse("PushedFilters", "").contains("term"))
        .map(s => (s.metadata("PushedFilters"),
          s.metrics("numOutputRows").value))
      val (candScans, plainScans) =
        scans.partition(_._1.contains("GreaterThanOrEqual(tf"))
      assert(candScans.nonEmpty, s"no floored scan in plan: $scans")
      // the hot-term scoring scan (term-IN-only, no floor): the smaller
      // of the ess (hot ≈ 1000 postings) and non (pad = 3000) scans
      assert(plainScans.nonEmpty, s"no term-IN-only scan in plan: $scans")
      val candRows = candScans.map(_._2).sum
      val essRows = plainScans.map(_._2).min
      assert(candRows * 2 < essRows,
        s"floored scan emitted $candRows vs term-IN-only $essRows — " +
          "tf floor did not skip the low-impact tail row groups")
    } finally {
      oldBlock.fold(hc.unset("parquet.block.size"))(
        hc.set("parquet.block.size", _))
      oldCheck.fold(hc.unset("parquet.block.size.row.check.min"))(
        hc.set("parquet.block.size.row.check.min", _))
    }
  }
}
