package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup
import graft.operators.Dedup

class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  private val doc = "the quick brown fox jumps over the lazy dog again and again " * 4
  private def mut(s: String, tag: String) = s + " " + tag

  test("exactWithinWatermark keeps first arrival per fingerprint, forgets after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val docs = in.toDF().toDF("id", "text", "ts")
    val out = StreamingDedup.exactWithinWatermark(docs, "text", "id", "ts", "5 minutes")
    val q = out.writeStream.format("memory").queryName("exact_dedup")
      .outputMode("append").start()
    try {
      // batch 1: duplicate content within the window -> one survivor
      in.addData((1L, "Hello  World", ts(0)), (2L, "hello world", ts(1)), (3L, "other", ts(1)))
      q.processAllAvailable()
      // advance watermark far past the dups, then re-send the same content:
      // fingerprint state was dropped, so it's kept again (bounded state).
      in.addData((4L, "advance", ts(30)))
      q.processAllAvailable()
      in.addData((5L, "hello world", ts(31)))
      q.processAllAvailable()
      val ids = spark.table("exact_dedup").select("id").as[Long].collect().sorted
      assert(ids.contains(1L) && !ids.contains(2L))
      assert(ids.contains(3L) && ids.contains(5L))
    } finally q.stop()
  }

  test("LshIndex dedups within a batch and against prior batches") {
    val dir = Files.createTempDirectory("lsh_index").toString + "/ix"
    val ix = new StreamingDedup.LshIndex(dir, shingleN = 3, numHashes = 64,
      bands = 16, threshold = 0.5)

    // batch 1: A and A' near-dups (A' survives nothing: greedy keeps min id), B distinct
    val b1 = Seq(
      (10L, mut(doc, "alpha")), (11L, mut(doc, "beta")),
      (20L, "completely different content about spark catalyst optimizer rules " * 8))
      .toDF("doc_id", "text")
    val s1 = ix.dedupeBatch(b1, "text", "doc_id")
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq === Seq(10L, 20L))

    // batch 2: A'' (near-dup of indexed A) dropped; C (new) kept
    val b2 = Seq(
      (30L, mut(doc, "gamma")),
      (40L, "yet another unrelated corpus document mentioning shuffle partitions " * 8))
      .toDF("doc_id", "text")
    val s2 = ix.dedupeBatch(b2, "text", "doc_id")
    assert(s2.select("doc_id").as[Long].collect().sorted.toSeq === Seq(40L))

    // index holds exactly the survivors' band rows, partitioned by band
    val ixDf = spark.read.parquet(dir)
    assert(ixDf.select("id").distinct().as[Long].collect().sorted.toSeq ===
      Seq(10L, 20L, 40L))
    assert(ixDf.groupBy("id").count().select("count").distinct().as[Long].head() === 16L)
  }

  test("LshIndex agrees with the batch minhashLshPairs on the same corpus") {
    // same docs through (a) one-shot batch LSH pairs, (b) the incremental
    // index in two batches -> identical near-dup verdicts.
    val docs = Seq(
      (1L, mut(doc, "one")), (2L, mut(doc, "two")),
      (3L, "spark structured streaming stateful processing watermark " * 10),
      (4L, mut(doc, "three")))
    val batchPairs = Dedup.minhashLshPairs(docs.toDF("doc_id", "text"),
        "text", "doc_id", 3, 64, 16, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(batchPairs === Set((1L, 2L), (1L, 4L), (2L, 4L)))

    val dir = Files.createTempDirectory("lsh_index2").toString + "/ix"
    val ix = new StreamingDedup.LshIndex(dir)
    val s1 = ix.dedupeBatch(docs.take(2).toDF("doc_id", "text"), "text", "doc_id")
    val s2 = ix.dedupeBatch(docs.drop(2).toDF("doc_id", "text"), "text", "doc_id")
    val kept = (s1.select("doc_id").as[Long].collect() ++
      s2.select("doc_id").as[Long].collect()).sorted.toSeq
    assert(kept === Seq(1L, 3L))  // 2 dropped in-batch, 4 dropped vs index
  }

  test("compact rewrites the index smaller, preserving content and dedup behavior") {
    val dir = Files.createTempDirectory("lsh_compact").toString + "/ix"
    val ix = new StreamingDedup.LshIndex(dir)
    // several small appends -> many files
    (0 until 4).foreach { b =>
      ix.dedupeBatch(Seq((b * 10L, s"unique content batch $b " + ("filler words " * 20)))
        .toDF("doc_id", "text"), "text", "doc_id")
    }
    val before = spark.read.parquet(dir)
    val rowsBefore = before.orderBy("id", "band").collect().toSeq
    def fileCount = {
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.walk(p).filter(_.toString.endsWith(".parquet")).count()
    }
    val filesBefore = fileCount
    ix.compact(spark)
    assert(fileCount < filesBefore)
    assert(spark.read.parquet(dir).orderBy("id", "band").collect().toSeq === rowsBefore)
    // post-compaction, probing still finds indexed docs
    val s = ix.dedupeBatch(
      Seq((99L, "unique content batch 2 " + ("filler words " * 20)),
          (98L, "brand new text never indexed " * 10)).toDF("doc_id", "text"),
      "text", "doc_id")
    assert(s.select("doc_id").as[Long].collect().toSeq === Seq(98L))
  }

  test("re-delivered batch yields identical survivors and no double-indexing") {
    val dir = Files.createTempDirectory("lsh_retry").toString + "/ix"
    val ix = new StreamingDedup.LshIndex(dir)
    val b = Seq((1L, mut(doc, "aa")), (2L, mut(doc, "bb")),
      (3L, "entirely distinct prose about state stores " * 8)).toDF("doc_id", "text")
    val first = ix.dedupeBatch(b, "text", "doc_id", batchId = Some(42L))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(first === Seq(1L, 3L))
    // foreachBatch retry: same batch id, rows already indexed ->
    // SAME survivors re-delivered (not dropped as dup-of-self),
    // and the index is not appended a second time
    val retry = ix.dedupeBatch(b, "text", "doc_id", batchId = Some(42L))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(retry === first)
    val perId = spark.read.parquet(dir).groupBy("id").count()
      .select("count").distinct().as[Long].collect().toSeq
    assert(perId === Seq(16L))   // one band-row set per doc, no dups
  }

  test("nearDupAvailableNow drains a file stream through the index exactly once") {
    val root = Files.createTempDirectory("stream_docs")
    val cp   = Files.createTempDirectory("stream_cp").toString
    val dir  = Files.createTempDirectory("lsh_index3").toString + "/ix"
    Seq((100L, mut(doc, "x")), (101L, mut(doc, "y")), (102L, "totally unique text " * 10))
      .toDF("doc_id", "text").write.parquet(root.toString + "/part1")

    val ix = new StreamingDedup.LshIndex(dir)
    var survivors = List.empty[Long]
    def run(): Unit = {
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("recursiveFileLookup", "true").parquet(root.toString)
      val q = StreamingDedup.nearDupAvailableNow(stream, ix, "text", "doc_id", cp,
        (s, _) => survivors = survivors ++ s.select("doc_id").as[Long].collect())
      q.awaitTermination(120000)
    }
    run()
    assert(survivors.sorted === List(100L, 102L))
    // second arrival: one near-dup of the indexed corpus, one new
    Seq((200L, mut(doc, "z")), (201L, "fresh never seen before content " * 10))
      .toDF("doc_id", "text").write.parquet(root.toString + "/part2")
    run()
    assert(survivors.sorted === List(100L, 102L, 201L))
  }
}
