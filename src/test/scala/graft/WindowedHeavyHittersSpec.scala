package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.WindowedHeavyHitters
import graft.streaming.WindowedHeavyHitters.{Tok, WindowTop}

class WindowedHeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  test("per-window MG top-k emits once the watermark passes the window (MapState + timers)") {
    val prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val cp = Files.createTempDirectory("whh_cp").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Tok]
    val win = 60000L

    def drain(): Seq[WindowTop] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[WindowTop]
      val q = WindowedHeavyHitters.run(in.toDS(), capacity = 16, topN = 3,
          windowMs = win, watermarkDelay = "0 seconds")
        .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[WindowTop], _: Long) =>
          buf.synchronized { buf ++= b.collect() }; ()
        }
        .start()
      try { q.awaitTermination(120000); buf.toSeq } finally q.stop()
    }

    try {
      // window 0: "spark" x3, "etl" x2, "x" x1 — nothing may emit yet
      in.addData(
        Tok(0L, 1000L, "spark"), Tok(0L, 2000L, "spark"), Tok(0L, 3000L, "spark"),
        Tok(0L, 4000L, "etl"), Tok(0L, 5000L, "etl"), Tok(0L, 6000L, "x"))
      val r1 = drain()
      assert(r1.isEmpty, s"window must not emit before its end: $r1")

      // an event two windows later advances the watermark past window 0 ->
      // its timer fires on the restarted query (state survived)
      in.addData(Tok(2 * win, 2 * win + 1000L, "later"))
      val r2 = drain()
      assert(r2.map(w => (w.window_ms, w.token, w.n)).sortBy(_._2) === Seq(
        (0L, "etl", 2L), (0L, "spark", 3L), (0L, "x", 1L)))

      // window 0 emitted exactly once: advancing further re-fires nothing
      in.addData(Tok(4 * win, 4 * win + 1000L, "even_later"))
      val r3 = drain()
      assert(!r3.exists(_.window_ms == 0L), s"window 0 re-emitted: $r3")
    } finally {
      if (prev.isEmpty) spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      else spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    }
  }
}
