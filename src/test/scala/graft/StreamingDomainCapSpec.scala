package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingDomainCap
import graft.streaming.StreamingDomainCap.{Doc, Verdict}

class StreamingDomainCapSpec extends SparkSuite {
  import spark.implicits._

  private def run(in: MemoryStream[Doc], cp: String,
                  defaultCap: Int, caps: Map[String, Int] = Map.empty): Seq[Verdict] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Verdict]
    val q = StreamingDomainCap.verdicts(in.toDS(), defaultCap, caps)
      .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Verdict], _: Long) =>
        buf.synchronized { buf ++= b.collect() }; ()
      }
      .start()
    try { q.awaitTermination(120000); buf.toSeq } finally q.stop()
  }

  private def withRocks[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally if (prev.nonEmpty)
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
  }

  test("cap holds across batches per host; per-host overrides; state restart-safe") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Doc]
      val cp = Files.createTempDirectory("sdc_cp").toString
      in.addData(Doc("a.com", 1L), Doc("a.com", 2L), Doc("b.org", 10L))
      val r1 = run(in, cp, defaultCap = 2, caps = Map("b.org" -> 1))
      assert(r1.map(v => (v.host, v.doc_id, v.kept)).sortBy(r => (r._1, r._2)) ===
        Seq(("a.com", 1L, true), ("a.com", 2L, true), ("b.org", 10L, true)))
      // batch 2 resumes from RocksDB: a.com is full (cap 2), b.org full (cap 1)
      in.addData(Doc("a.com", 3L), Doc("b.org", 11L), Doc("c.net", 20L))
      val r2 = run(in, cp, defaultCap = 2, caps = Map("b.org" -> 1))
      assert(r2.map(v => (v.host, v.doc_id, v.kept)).sortBy(r => (r._1, r._2)) ===
        Seq(("a.com", 3L, false), ("b.org", 11L, false), ("c.net", 20L, true)))
      val a3 = r2.find(_.doc_id == 3L).get
      assert(a3.n_seen === 3L && a3.n_kept === 2L)
    }
  }

  test("id-ordered delivery reproduces the batch perDomainCap exactly") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      val docs = Seq(
        ("a.com", 5L), ("a.com", 1L), ("a.com", 3L), ("a.com", 9L),
        ("b.org", 2L), ("b.org", 7L), ("b.org", 4L))
      val in = MemoryStream[Doc]
      val cp = Files.createTempDirectory("sdc_cp2").toString
      // one batch: the processor's intra-batch id sort IS id-ordered delivery
      in.addData(docs.map { case (h, i) => Doc(h, i) }: _*)
      val streamed = run(in, cp, defaultCap = 2)
        .filter(_.kept).map(v => v.doc_id).toSet
      val batch = graft.operators.Domains.perDomainCap(
          docs.toDF("host", "doc_id"), "host", "doc_id", cap = 2)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed === batch)
      assert(streamed === Set(1L, 3L, 2L, 4L))
    }
  }
}
