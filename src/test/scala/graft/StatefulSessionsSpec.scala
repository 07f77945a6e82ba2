package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Event, Session}

class StatefulSessionsSpec extends SparkSuite {
  import spark.implicits._

  test("flatMapGroupsWithState sessionization closes sessions across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StatefulSessions.gapSessionize(input.toDS(), gapSeconds = 60)

    val q = sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode("append").start()

    val us = 1000000L
    // batch 1: user 1 -> two events 10s apart (one open session).
    // Timestamps start at 1s: an event exactly at the epoch-0 initial
    // watermark would be treated as late and dropped.
    input.addData(Event(1L, 1L * us, 1.0), Event(1L, 11L * us, 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() === 0)   // still open

    // batch 2: a 5-minute gap closes the first session, starts another
    input.addData(Event(1L, 311L * us, 5.0))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").as[Session].collect()
    assert(closed.length === 1)
    assert(closed(0).user_id === 1L)
    assert(closed(0).n_events === 2L)
    assert(closed(0).sum_value === 3.0)
    assert(closed(0).start_us === 1L * us && closed(0).end_us === 11L * us)

    // batch 3: another user's much-later event pushes the watermark past
    // user 1's gap -> user 1's OPEN session is flushed via event-time
    // timeout (the unbounded-state fix), user 2's stays open.
    input.addData(Event(2L, 4000L * us, 1.0))
    q.processAllAvailable()
    val all = spark.table("sessions_out").as[Session].collect()
    assert(all.length === 2)
    val flushed = all.filter(_.start_us == 311L * us)
    assert(flushed.length === 1)
    assert(flushed(0).user_id === 1L)
    assert(flushed(0).n_events === 1L && flushed(0).sum_value === 5.0)

    q.stop()
  }
}
