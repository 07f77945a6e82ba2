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

  test("shardManifest: counts/token sums/fingerprints recompose to the corpus exactly") {
    val m = Export.shardManifest(docs, "doc_id", "n_tokens", 4)
      .as[(Int, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(m.map(_._2).sum === 200L)
    assert(m.map(_._3).sum === (1L to 200L).map(_ % 7 + 1).sum)
    // fingerprints match a local recomputation of the same assignment
    val tagged = Export.withShard(docs, "doc_id", 4)
      .select("shard", "doc_id").as[(Int, Long)].collect()
    val want = tagged.groupBy(_._1).map { case (s, rows) =>
      val ids = rows.map(_._2).sorted.mkString(",")
      val d = java.security.MessageDigest.getInstance("MD5")
      s -> d.digest(ids.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    m.foreach { case (s, _, _, md) => assert(md === want(s), s"shard $s") }
  }

  test("writeShards: shard=<i> layout on disk, manifest verifies the files, roundtrip exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-export").toString
    val manifest = Export.writeShards(docs, "doc_id", "n_tokens", 4, dir)
      .as[(Int, Long, Long, String)].collect().toSeq.sortBy(_._1)
    // layout: one partition directory per non-empty shard
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.toSeq === manifest.map(m => s"shard=${m._1}"))
    // the FILES must verify against the manifest: recompute each
    // shard's fingerprint from what was actually written
    val back = spark.read.parquet(dir)
    assert(back.count() === 200L)
    val perShard = back.groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("n_tokens").as("t"),
        md5(concat_ws(",", sort_array(collect_list(col("doc_id"))))).as("md"))
      .as[(Int, Long, Long, String)].collect().toSeq.sortBy(_._1)
    assert(perShard === manifest)
  }
}
