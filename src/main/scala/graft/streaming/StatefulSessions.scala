package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` — gap-based
  * sessionization that EMITS a session row when a gap larger than
  * `gapSeconds` closes it, plus on EVENT-TIME state timeout: when the
  * watermark passes `last event + gap`, the open session is flushed and its
  * state dropped — so the final session per user IS emitted and per-user
  * state never grows without bound on a real stream. The arbitrary-state
  * analogue of the batch q27 sessionize query.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts_us: Long, value: Double)
  final case class SessionState(start_us: Long, last_us: Long, n: Long, sum_value: Double)
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long, sum_value: Double)

  /** @param watermarkDelay max out-of-orderness of `ts_us` (event time).
    *                       The open session flushes once the watermark
    *                       passes `last_us + gapSeconds`.
    */
  def gapSessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800L,
      watermarkDelay: String = "0 seconds"
  ): Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("__event_time", timestamp_micros(col("ts_us")))
      .withWatermark("__event_time", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (user: Long, evs: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            // Watermark passed last_us + gap: flush the open session, drop
            // state (bounded state on a real stream).
            val open = state.getOption
              .map(s => Session(user, s.start_us, s.last_us, s.n, s.sum_value))
            state.remove()
            open.iterator
          } else {
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
            cur.foreach { s =>
              state.update(s)
              // Timeout must stay ahead of the current watermark (setting
              // an already-passed timestamp throws); +1ms keeps late
              // stragglers flushable on the very next watermark move.
              state.setTimeoutTimestamp(math.max(
                s.last_us / 1000L + gapSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.result().iterator
          }
        })
  }
}
