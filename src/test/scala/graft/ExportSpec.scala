package graft

import org.apache.spark.sql.functions._
import graft.corpus.Export

class ExportSpec extends SparkSuite {
  import spark.implicits._

  private val docs = (1L to 200L).map(i => (i, i % 7 + 1)).toDF("doc_id", "n_tokens")

  test("withShard: in-range, deterministic, append-stable, map-side") {
    val tagged = Export.withShard(docs, "doc_id", 8)
    val byId = tagged.select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(byId.values.forall(s => s >= 0 && s < 8))
    assert(byId.values.toSet.size > 1) // hash actually spreads
    // appending rows never moves an existing row's shard
    val grown = Export.withShard(
      docs.unionByName((201L to 400L).map(i => (i, 1L)).toDF("doc_id", "n_tokens")),
      "doc_id", 8).select("doc_id", "shard").as[(Long, Int)].collect().toMap
    byId.foreach { case (id, s) => assert(grown(id) === s, s"doc $id moved") }
    assert(!tagged.queryExecution.executedPlan.toString.contains("Exchange"))
    intercept[IllegalArgumentException] { Export.withShard(docs, "doc_id", 0) }
    intercept[IllegalArgumentException] {
      Export.withShard(docs.withColumn("shard", lit(1)), "doc_id", 8)
    }
  }

  // local mirror of Export.idFingerprint: first 12 hex digits of
  // md5(id.toString) parsed as a long
  private def h48(id: Any): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  test("shardManifest: counts/token sums/fingerprints recompose to the corpus exactly") {
    val m = Export.shardManifest(docs, "doc_id", "n_tokens", 4)
      .as[(Int, Long, Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(m.map(_._2).sum === 200L)
    assert(m.map(_._3).sum === (1L to 200L).map(_ % 7 + 1).sum)
    // fingerprints match a local recomputation of the same assignment —
    // commutative (sum + xor of 48-bit id hashes), so the local fold
    // needs no ordering
    val tagged = Export.withShard(docs, "doc_id", 4)
      .select("shard", "doc_id").as[(Int, Long)].collect()
    val want = tagged.groupBy(_._1).map { case (s, rows) =>
      val hs = rows.map(r => h48(r._2))
      // fp_sum ships as the exact decimal digits: sums exceed 2^53, so
      // a string column is the only type every downstream hasher agrees on
      s -> (hs.map(BigInt(_)).sum.toString, hs.reduce(_ ^ _))
    }
    m.foreach { case (s, _, _, fpSum, fpXor) =>
      assert((fpSum, fpXor) === want(s), s"shard $s")
    }
    // the aggregation is partial-agged (map-side combine), never a
    // buffered list: ObjectHashAggregate/collect_list absent from plan
    val plan = Export.shardManifest(docs, "doc_id", "n_tokens", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("property: growing the corpus never flips an existing row's shard (randomized)") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 5) {
      val nShards = 1 + rnd.nextInt(15)
      val n = 50 + rnd.nextInt(200)
      val grow = 1 + rnd.nextInt(150)
      // mixed id types across trials: longs and strings
      if (trial % 2 == 0) {
        val ids = Seq.fill(n + grow)(rnd.nextLong()).distinct
        val pre = Export.withShard(ids.take(n).toDF("id"), "id", nShards)
          .as[(Long, Int)].collect().toMap
        val full = Export.withShard(ids.toDF("id"), "id", nShards)
          .as[(Long, Int)].collect().toMap
        pre.foreach { case (id, s) =>
          assert(full(id) === s, s"trial=$trial id=$id moved")
        }
      } else {
        val ids = Seq.fill(n + grow)(s"doc-${rnd.nextInt(1000000)}").distinct
        val pre = Export.withShard(ids.take(n).toDF("id"), "id", nShards)
          .as[(String, Int)].collect().toMap
        val full = Export.withShard(ids.toDF("id"), "id", nShards)
          .as[(String, Int)].collect().toMap
        pre.foreach { case (id, s) =>
          assert(full(id) === s, s"trial=$trial id=$id moved")
        }
      }
    }
  }

  test("streaming tie-in: shard assignment over a streamed release stays stable across batches") {
    import graft.corpus.ReleasePipeline
    val docs0 = Tables(spark, sf("sf0.001"), "documents")
      .where(col("text").isNotNull)
    val benchmark = docs0.where(pmod(col("doc_id"), lit(10)) === 0)
    val base = docs0.where(pmod(col("doc_id"), lit(3)) === 0)
    val b1 = docs0.where(pmod(col("doc_id"), lit(3)) === 1)
    val b2 = docs0.where(pmod(col("doc_id"), lit(3)) === 2)
    val cfg = ReleasePipeline.Config(packCapacity = 256L)
    val rel = ReleasePipeline.run(base, benchmark, cfg)
    val root = java.nio.file.Files.createTempDirectory("exp_stream").toString + "/s"
    val sink = new graft.streaming.StreamingReleaseAppend(root, benchmark, cfg)
    sink.initPrior(rel.toPrior)
    def shards(): Map[Long, Int] = Export.withShard(
        sink.currentPrior(spark).corpus.select("doc_id"), "doc_id", 8)
      .as[(Long, Int)].collect().toMap
    val s0 = shards()
    assert(sink.processBatch(b1, 0L))
    val s1 = shards()
    assert(sink.processBatch(b2, 1L))
    val s2 = shards()
    // every release grows the corpus; no surviving doc's shard ever moves
    assert(s1.size > s0.size && s2.size > s1.size)
    s0.foreach { case (id, s) => assert(s1(id) === s && s2(id) === s, s"doc $id") }
    s1.foreach { case (id, s) => assert(s2(id) === s, s"doc $id") }
  }

  test("writeShards: shard=<i> layout on disk, manifest verifies the files, roundtrip exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    val manifest = Export.writeShards(docs, "doc_id", "n_tokens", 4, dir)
      .as[(Int, Long, Long, String, Long)].collect().toSeq.sortBy(_._1)
    // layout: one partition directory per non-empty shard
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq === manifest.map(m => s"shard=${m._1}"))
    // the FILES must verify against the manifest: recompute each
    // shard's fingerprint from what was actually written
    val back = spark.read.parquet(dir)
    assert(back.count() === 200L)
    val h = Export.idFingerprint(col("doc_id"))
    val perShard = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("t"),
        sum(h.cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("string").as("fps"),
        bit_xor(h).as("fpx"))
      .as[(Int, Long, Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(perShard === manifest)
  }
}
