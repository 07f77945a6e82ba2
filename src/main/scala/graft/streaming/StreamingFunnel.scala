package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Real-time funnel tracking on `transformWithState`: each user's funnel
  * stage (how many of the ordered steps they have completed, in order)
  * advances incrementally as events arrive — the streaming complement of
  * the batch [[graft.operators.Funnel]] (q66), which needs the whole
  * history per run.
  *
  * Semantics match the batch operator's subsequence rule: an event
  * advances the stage iff its type equals the NEXT expected step; other
  * events (including repeats of completed steps) leave the stage as-is.
  * A transition row is emitted only when the stage advances, so downstream
  * funnel dashboards aggregate transitions, not raw events.
  *
  * Scale: state is ONE integer per user (RocksDB-backed, disk-spillable),
  * no timers, no per-event retention. Each user's rows are sorted by
  * event time WITHIN a micro-batch before advancing stages, so arbitrary
  * shuffle delivery order cannot diverge from the batch semantics; only
  * lateness ACROSS micro-batches (an earlier-ts event arriving a batch
  * later) still needs event-time timers/watermarking, which this
  * processing-time tracker deliberately trades away.
  */
object StreamingFunnel {

  final case class Ev(user_id: Long, ts_ms: Long, event_type: String)
  final case class Transition(user_id: Long, stage: Int, at_ms: Long)

  class Processor(steps: Seq[String])
      extends StatefulProcessor[Long, Ev, Transition] {
    @transient private var stage: ValueState[Int] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stage = getHandle.getValueState[Int]("stage", Encoders.scalaInt,
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[Transition] = {
      var s = if (stage.exists()) stage.get() else 0
      val out = Seq.newBuilder[Transition]
      // Event-time order within the micro-batch: network/shuffle delivery
      // order is arbitrary, and consuming out-of-order events would diverge
      // from the batch Funnel's ts-ordered semantics (an A→B funnel must
      // not fire on a B delivered before its A). The buffer is one user's
      // share of one micro-batch — bounded by batch sizing, not stream
      // lifetime. Stable sort: equal-ts events keep arrival order.
      rows.toSeq.sortBy(_.ts_ms).foreach { e =>
        if (s < steps.size && e.event_type == steps(s)) {
          s += 1
          out += Transition(user, s, e.ts_ms)
        }
      }
      stage.update(s)
      out.result().iterator
    }
  }

  /** Wire: group events by user, advance stages, emit transitions. */
  def transitions(events: Dataset[Ev], steps: Seq[String]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Processor(steps),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
