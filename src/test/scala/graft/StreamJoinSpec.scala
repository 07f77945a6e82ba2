package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.IncrementalRunner

class StreamJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:$s%02d")

  test("stream-stream interval join matches within tolerance only, per key") {
    implicit val sqlCtx = spark.sqlContext
    val cands = MemoryStream[(Long, Timestamp, String)]
    val obs   = MemoryStream[(Long, Timestamp, String)]
    val joined = IncrementalRunner.intervalJoin(
      cands.toDF().toDF("beam", "c_ts", "cand"),  "c_ts",
      obs.toDF().toDF("beam", "o_ts", "obs"),     "o_ts",
      keys = Seq("beam"), toleranceSeconds = 60L, watermark = "5 minutes")
      .selectExpr("cand", "obs")
    val q = joined.writeStream.format("memory").queryName("sj")
      .outputMode("append").start()
    try {
      obs.addData((1L, ts(10), "obsA"), (1L, ts(30), "obsB"), (2L, ts(10), "obsC"))
      cands.addData(
        (1L, ts(10, 30), "c1"),  // 30s from obsA (beam 1) -> match
        (1L, ts(20), "c2"),      // 10 min from both -> no match
        (2L, ts(9, 30), "c3"),   // 30s from obsC (beam 2) -> match
        (1L, ts(9, 30), "c4"))   // 30s from obsA -> match; obsC is beam 2
      q.processAllAvailable()
      val got = spark.table("sj").as[(String, String)].collect().toSet
      assert(got === Set(("c1", "obsA"), ("c3", "obsC"), ("c4", "obsA")))
    } finally q.stop()
  }

  test("interval-join state requirements appear in the plan (watermarks both sides)") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Long, Timestamp)]
    val b = MemoryStream[(Long, Timestamp)]
    val joined = IncrementalRunner.intervalJoin(
      a.toDF().toDF("k", "a_ts"), "a_ts",
      b.toDF().toDF("k", "b_ts"), "b_ts",
      keys = Seq("k"), toleranceSeconds = 30L)
    // analyzed plan carries both event-time watermarks — the state-bound
    // precondition for an indefinitely running stream-stream join
    val plan = joined.queryExecution.analyzed.toString
    assert("EventTimeWatermark".r.findAllIn(plan).size === 2)
  }
}
