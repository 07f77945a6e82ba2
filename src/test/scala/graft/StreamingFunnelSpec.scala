package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{Ev, Transition}

class StreamingFunnelSpec extends SparkSuite {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("stage transitions advance incrementally and survive restart; parity with batch funnel") {
    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val cp = Files.createTempDirectory("funnel_cp").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]

    def drain(expect: Int): Seq[Transition] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Transition]
      val q = StreamingFunnel.transitions(in.toDS(), steps)
        .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Transition], _: Long) =>
          buf.synchronized { buf ++= b.collect() }; ()
        }.start()
      // The transformWithState query never self-terminates (it keeps
      // scheduling batches), so awaitTermination(timeout) burns the whole
      // timeout and processAllAvailable never latches. Poll for the
      // EXPECTED row count with a grace window (over-emission still hits
      // the exact-equality asserts).
      try {
        val deadline = System.currentTimeMillis() + 90000
        while (buf.synchronized(buf.size) < expect &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        Thread.sleep(500)
        buf.toSeq
      } finally q.stop()
    }

    try {
      // user 1 completes view->click; the purchase BEFORE any view (user 2)
      // must not advance anything.
      in.addData(Ev(1L, 10L, "view"), Ev(1L, 20L, "click"),
        Ev(2L, 5L, "purchase"), Ev(2L, 30L, "view"))
      val r1 = drain(expect = 3).sortBy(t => (t.user_id, t.stage))
      assert(r1 === Seq(Transition(1L, 1, 10L), Transition(1L, 2, 20L),
        Transition(2L, 1, 30L)))

      // restart: user 1's stage=2 is remembered — a repeat click emits
      // nothing, the purchase completes the funnel.
      in.addData(Ev(1L, 40L, "click"), Ev(1L, 50L, "purchase"))
      val r2 = drain(expect = 1)
      assert(r2 === Seq(Transition(1L, 3, 50L)))
    } finally {
      if (prevProvider.isEmpty)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      else spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }

  test("streamed event table reaches the same final stages as batch Funnel.stages") {
    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val cp = Files.createTempDirectory("funnel_parity_cp").toString
    implicit val sqlCtx = spark.sqlContext
    try {
      val ev = Tables(spark, sf("sf0.001"), "events")
        .where(col("event_type").isin(steps: _*))
        .select(col("user_id"), unix_micros(col("ts")).as("ts_ms"),
          col("event_type"), col("event_id"))
        .orderBy("ts_ms", "event_id")    // arrival order = batch tie-break order
        .select(col("user_id"), col("ts_ms"), col("event_type"))
        .as[Ev].collect()

      // batch truth first: per-user final stage; a user reaching stage k
      // emits exactly k transitions, so the stream must produce sum(stages)
      // rows in total — the poll target.
      val batch = graft.operators.Funnel.stages(
          Tables(spark, sf("sf0.001"), "events"),
          "user_id", "ts", "event_id", "event_type", steps)
        .where(col("stage") > 0)
        .as[(Long, Int)].collect().toMap
      val expect = batch.values.sum

      val in = MemoryStream[Ev]
      in.addData(ev.toIndexedSeq)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Transition]
      val q = StreamingFunnel.transitions(in.toDS(), steps)
        .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Transition], _: Long) =>
          buf.synchronized { buf ++= b.collect() }; ()
        }.start()
      val deadline = System.currentTimeMillis() + 120000
      while (buf.synchronized(buf.size) < expect &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      Thread.sleep(500)
      q.stop()

      val streamed = buf.groupBy(_.user_id).view.mapValues(_.map(_.stage).max).toMap
      assert(streamed === batch)
    } finally {
      if (prevProvider.isEmpty)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      else spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }
}
