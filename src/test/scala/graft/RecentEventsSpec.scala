package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.RecentEvents
import graft.streaming.RecentEvents.{Enriched, Ev}

class RecentEventsSpec extends SparkSuite {
  import spark.implicits._

  test("ListState keeps only the last N prior events per key, across restarts") {
    val prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val cp = Files.createTempDirectory("recent_cp").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]

    def drain(): Seq[Enriched] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Enriched]
      val q = RecentEvents.enrich(in.toDS(), retain = 3)
        .writeStream.outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Enriched], _: Long) =>
          buf.synchronized { buf ++= b.collect() }; ()
        }
        .start()
      try { q.awaitTermination(120000); buf.toSeq } finally q.stop()
    }

    try {
      in.addData(Ev(1L, 1, 10.0), Ev(1L, 2, 20.0), Ev(1L, 3, 30.0), Ev(2L, 1, 5.0))
      val r1 = drain().sortBy(e => (e.key, e.seq))
      assert(r1.map(e => (e.key, e.seq, e.n_prior, e.mean_prior, e.max_prior)) === Seq(
        (1L, 1L, 0L, 0.0, 0.0),
        (1L, 2L, 1L, 10.0, 10.0),
        (1L, 3L, 2L, 15.0, 20.0),
        (2L, 1L, 0L, 0.0, 0.0)))

      // restart: key 1 has [10,20,30] retained; a 4th event sees exactly
      // the last 3, and a 5th sees [20,30,40] (oldest dropped)
      in.addData(Ev(1L, 4, 40.0), Ev(1L, 5, 50.0))
      val r2 = drain().sortBy(_.seq)
      assert(r2.map(e => (e.seq, e.n_prior, e.mean_prior, e.max_prior)) === Seq(
        (4L, 3L, 20.0, 30.0),
        (5L, 3L, 30.0, 40.0)))
    } finally {
      if (prev.isEmpty) spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      else spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    }
  }
}
