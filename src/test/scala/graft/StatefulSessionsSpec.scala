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
    // batch 1: user 1 -> two events 10s apart (one open session)
    input.addData(Event(1L, 0L, 1.0), Event(1L, 10L * us, 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() === 0)   // still open

    // batch 2: a 5-minute gap closes the first session, starts another
    input.addData(Event(1L, 310L * us, 5.0))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").as[Session].collect()
    assert(closed.length === 1)
    assert(closed(0).user_id === 1L)
    assert(closed(0).n_events === 2L)
    assert(closed(0).sum_value === 3.0)
    assert(closed(0).start_us === 0L && closed(0).end_us === 10L * us)

    q.stop()
  }
}
