package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingVectorDedup.VectorBandIndex

/** Incremental EMBEDDING near-dup against the persistent band index —
  * the vector analogue of the text LshIndex, same contracts: planted
  * near-dups drop across batches, incremental == one-shot on id-ordered
  * batches, re-delivery is idempotent.
  */
class StreamingVectorDedupSpec extends SparkSuite {
  import spark.implicits._

  // 30 well-separated base vectors (seeded Gaussian — random 16-dim
  // cosines concentrate near 0) + 3 planted near-copies (tiny
  // perturbation, cosine > 0.99) with ids above every base id.
  private def corpus = {
    val base = (0 until 30).map { i =>
      val rnd = new scala.util.Random(42 + i)
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val copies = Seq(0, 7, 19).zipWithIndex.map { case (src, j) =>
      val v = base(src)._2.zipWithIndex
        .map { case (x, d) => x + (if (d == 0) 1e-4f else 0f) }
      (100L + j, v)
    }
    (base ++ copies).toDF("vec_id", "embedding")
  }

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_vix").toString + "/ix"

  test("planted near-copies drop across batches; originals survive") {
    val ix = new VectorBandIndex(freshDir(), bandBits = 8, bands = 16, threshold = 0.9)
    val docs = corpus
    val s1 = ix.dedupeBatch(docs.where(col("vec_id") < 50), "embedding", "vec_id")
    val s2 = ix.dedupeBatch(docs.where(col("vec_id") >= 50), "embedding", "vec_id")
    assert(s1.count() === 30)                       // no dups among bases
    assert(s2.count() === 0)                        // every copy caught by the index
    val ids = s1.select("vec_id").as[Long].collect().toSet
    assert(ids === (0L until 30L).toSet)
  }

  test("incremental == one-shot on id-ordered batches") {
    val docs = corpus
    val inc = {
      val ix = new VectorBandIndex(freshDir(), threshold = 0.9)
      val s1 = ix.dedupeBatch(docs.where(col("vec_id") <= 15), "embedding", "vec_id")
      val s2 = ix.dedupeBatch(docs.where(col("vec_id") > 15), "embedding", "vec_id")
      s1.select("vec_id").union(s2.select("vec_id")).as[Long].collect().toSet
    }
    val oneShot = new VectorBandIndex(freshDir(), threshold = 0.9)
      .dedupeBatch(docs, "embedding", "vec_id", appendToIndex = false)
      .select("vec_id").as[Long].collect().toSet
    assert(inc === oneShot)
  }

  test("re-delivered batch yields identical survivors and no double-indexing") {
    val dir = freshDir()
    val ix = new VectorBandIndex(dir, threshold = 0.9)
    val docs = corpus
    val first = ix.dedupeBatch(docs.where(col("vec_id") < 50), "embedding", "vec_id",
      batchId = Some(1L))
    val n1 = first.count()
    val ixRows = spark.read.parquet(dir).count()
    // at-least-once re-delivery of the SAME batch id
    val again = ix.dedupeBatch(docs.where(col("vec_id") < 50), "embedding", "vec_id",
      batchId = Some(1L))
    assert(again.count() === n1)                    // identical output
    assert(spark.read.parquet(dir).count() === ixRows)  // no double append
  }

  test("compact preserves content and dedup behavior; markers survive") {
    val dir = freshDir()
    val ix = new VectorBandIndex(dir, threshold = 0.9)
    val docs = corpus
    ix.dedupeBatch(docs.where(col("vec_id") < 50), "embedding", "vec_id",
      batchId = Some(7L))
    val before = spark.read.parquet(dir).count()
    ix.compact(spark, filesPerBand = 1)
    assert(spark.read.parquet(dir).count() === before)
    // the planted copies are still caught by the compacted index
    assert(ix.dedupeBatch(docs.where(col("vec_id") >= 50), "embedding", "vec_id")
      .count() === 0)
    // the batch ledger survived the swap (re-delivery still skipped)
    assert(new java.io.File(dir + "/_batches/7").exists())
  }

  test("an all-filtered first batch leaves no unreadable index behind") {
    // Every row lacks a usable vector: nothing may be appended (an empty
    // partitioned write leaves a data-less `_SUCCESS`-only dir the next
    // batch cannot read), but the batch marker still commits.
    val dir = freshDir()
    val ix = new VectorBandIndex(dir, threshold = 0.9)
    val empty = Seq((900L, Array.empty[Float]), (901L, Array.empty[Float]))
      .toDF("vec_id", "embedding")
    val out = ix.dedupeBatch(empty, "embedding", "vec_id", batchId = Some(3L))
    assert(out.count() === 2)  // vector-less rows pass through undeduped
    assert(new java.io.File(dir + "/_batches/3").exists())
    // the next REAL batch must work (this read crashed pre-fix)
    val s = ix.dedupeBatch(corpus.where(col("vec_id") < 50), "embedding", "vec_id")
    assert(s.count() === 30)
  }

  test("crash between append and marker: re-delivery duplicates are output-invisible and compact scrubs them") {
    // Simulate a crash AFTER the survivors' append committed but BEFORE
    // the batch marker was created (the documented at-least-once window):
    // run the batch, delete its marker, re-deliver.
    val dir = freshDir()
    val ix = new VectorBandIndex(dir, threshold = 0.9)
    val bases = corpus.where(col("vec_id") < 50)
    val n1 = ix.dedupeBatch(bases, "embedding", "vec_id", batchId = Some(1L)).count()
    val rows1 = spark.read.parquet(dir).count()
    assert(new java.io.File(dir + "/_batches/1").delete())  // the "crash"
    val n2 = ix.dedupeBatch(bases, "embedding", "vec_id", batchId = Some(1L)).count()
    assert(n2 === n1)                                       // output identical
    assert(spark.read.parquet(dir).count() === 2 * rows1)   // bloat, not corruption
    ix.compact(spark)
    assert(spark.read.parquet(dir).count() === rows1)       // duplicates scrubbed
    // the deduplicated index still catches the planted copies
    assert(ix.dedupeBatch(corpus.where(col("vec_id") >= 50), "embedding", "vec_id")
      .count() === 0)
  }

  test("compact recovers from a crash at every mid-compact window") {
    val dir = freshDir()
    val ix = new VectorBandIndex(dir, threshold = 0.9)
    ix.dedupeBatch(corpus.where(col("vec_id") < 50), "embedding", "vec_id",
      batchId = Some(5L))
    val rows = spark.read.parquet(dir).count()

    def move(from: String, to: String) =
      assert(new java.io.File(from).renameTo(new java.io.File(to)))
    // window 1: crash during write-new — stale __compacting beside a
    // healthy index; the index is readable the whole time.
    val tmp = dir + "__compacting"
    spark.read.parquet(dir).limit(1).write.parquet(tmp)
    ix.compact(spark)
    assert(!new java.io.File(tmp).exists())
    assert(spark.read.parquet(dir).count() === rows)

    // window 2: torn swap — dir missing, __old holding the data. The
    // next compact must roll the swap back, not treat the corpus as empty.
    move(dir, dir + "__old")
    ix.compact(spark)
    assert(spark.read.parquet(dir).count() === rows)
    assert(!new java.io.File(dir + "__old").exists())

    // window 3: swap completed but cleanup crashed — __old remnant with
    // the unmoved batch ledger. compact rescues the ledger then cleans.
    new java.io.File(dir + "__old").mkdirs()
    move(dir + "/_batches", dir + "__old/_batches")
    ix.compact(spark)
    assert(!new java.io.File(dir + "__old").exists())
    assert(new java.io.File(dir + "/_batches/5").exists())
    // the recovered index still catches the planted copies
    assert(ix.dedupeBatch(corpus.where(col("vec_id") >= 50), "embedding", "vec_id")
      .count() === 0)
  }

  test("no forced broadcast: dedup stays correct when broadcast joins are disabled") {
    // The build side is AQE's choice, not a hint — a huge backfill batch
    // must degrade to a non-broadcast plan, never a driver OOM. Pin by
    // running the whole dedup with broadcasting switched off entirely.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ix = new VectorBandIndex(freshDir(), threshold = 0.9)
      val docs = corpus
      val s1 = ix.dedupeBatch(docs.where(col("vec_id") < 50), "embedding", "vec_id")
      val s2 = ix.dedupeBatch(docs.where(col("vec_id") >= 50), "embedding", "vec_id")
      assert(s1.count() === 30 && s2.count() === 0)
      assert(s2.queryExecution.analyzed.toString.indexOf("ResolvedHint") === -1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("index layout is band-partitioned (probe-prunable)") {
    val dir = freshDir()
    val ix = new VectorBandIndex(dir, bandBits = 4, bands = 4, threshold = 0.9)
    ix.dedupeBatch(corpus, "embedding", "vec_id")
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("band=")).map(_.getName).toSet
    assert(parts.nonEmpty && parts.forall(_.matches("band=\\d+")))
  }

  test("nearDupAvailableNow: exactly-once drain with scheduled compaction; registry stays exact") {
    val root = java.nio.file.Files.createTempDirectory("vec_stream")
    val cp = java.nio.file.Files.createTempDirectory("vec_cp").toString
    val dir = freshDir()
    val docs = corpus
    // two landing files → batch ids 0,1; compaction fires after id 1
    docs.where(col("vec_id") < 50).coalesce(1)
      .write.parquet(root.toString + "/p0")
    docs.where(col("vec_id") >= 50).coalesce(1)
      .write.parquet(root.toString + "/p1")
    val ix = new VectorBandIndex(dir, bandBits = 8, bands = 16, threshold = 0.9)
    var survivors = List.empty[Long]
    def run(): Unit = {
      val stream = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1").parquet(root.toString)
      val q = graft.streaming.StreamingVectorDedup.nearDupAvailableNow(
        stream, ix, "embedding", "vec_id", cp,
        (s, _) => survivors = survivors ++ s.select("vec_id").as[Long].collect(),
        compactEvery = 2)
      q.awaitTermination(120000)
    }
    run()
    // all 30 bases survive; every planted copy drops against the index
    assert(survivors.sorted === (0L until 30L).toList)
    // compaction ran: each band partition folded to one file
    val bandDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("band="))
    assert(bandDirs.nonEmpty)
    assert(bandDirs.forall(
      _.listFiles().count(f => f.getName.endsWith(".parquet")) == 1))
    // restart: nothing re-processes
    run()
    assert(survivors.sorted === (0L until 30L).toList)
    // post-compaction arrival: a copy of base 3 drops against the
    // COMPACTED registry; a fresh vector survives
    val late = Seq(
      (200L, corpus.where(col("vec_id") === 3L)
        .select("embedding").as[Array[Float]].head()),
      (201L, Array.fill(16)(new scala.util.Random(999).nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    late.coalesce(1).write.parquet(root.toString + "/p2")
    run()
    assert(survivors.sorted === ((0L until 30L) :+ 201L).toList)
  }
}
