package graft

import java.nio.file.Files
import java.time.Duration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.TtlDedup

class TtlDedupSpec extends SparkSuite {
  import spark.implicits._

  test("transformWithState dedup: first-arrival verdicts, dup counts, state survives restart") {
    // transformWithState requires the RocksDB state store provider.
    // ProcessingTime time-mode runs continuous empty batches under the
    // default trigger, so drive it with AvailableNow runs sharing one
    // checkpoint — which also proves state durability across restarts.
    val prevProvider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val cp = Files.createTempDirectory("ttl_dedup_cp").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TtlDedup.FpDoc]

    def drain(expect: Int): Seq[TtlDedup.Verdict] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[TtlDedup.Verdict]
      val out = TtlDedup.verdicts(in.toDS(), Duration.ofMinutes(10))
      val q = out.writeStream
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[TtlDedup.Verdict], _: Long) =>
          buf.synchronized { buf ++= batch.collect() }; ()
        }
        .start()
      // The transformWithState query never self-terminates under
      // AvailableNow (pending ProcessingTime timers keep scheduling
      // batches, so both awaitTermination(timeout) and
      // processAllAvailable wait forever / the whole timeout — measured
      // 4 of the suite's 18 minutes were exactly these burned timeouts).
      // Poll for the EXPECTED row count instead, with a grace window so
      // over-emission still reaches the exact-equality asserts.
      try {
        val deadline = System.currentTimeMillis() + 90000
        while (buf.synchronized(buf.size) < expect &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        Thread.sleep(500)
        buf.toSeq
      } finally q.stop()
    }

    try {
      in.addData(TtlDedup.FpDoc("a", 1L), TtlDedup.FpDoc("a", 2L), TtlDedup.FpDoc("b", 3L))
      val r1 = drain(expect = 3).sortBy(_.doc_id)
      assert(r1.map(v => (v.doc_id, v.is_first, v.n_seen)) === Seq(
        (1L, true, 1L), (2L, false, 2L), (3L, true, 1L)))

      // restart from the same checkpoint: fingerprint "a" is remembered
      in.addData(TtlDedup.FpDoc("a", 4L), TtlDedup.FpDoc("c", 5L))
      val r2 = drain(expect = 2).sortBy(_.doc_id)
      assert(r2.map(v => (v.doc_id, v.is_first, v.n_seen)) === Seq(
        (4L, false, 3L), (5L, true, 1L)))
      // every duplicate names the kept representative
      assert((r1 ++ r2).filter(_.fp == "a").forall(_.first_id == 1L))
    } finally {
      if (prevProvider.isEmpty)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      else spark.conf.set("spark.sql.streaming.stateStore.providerClass", prevProvider)
    }
  }
}
