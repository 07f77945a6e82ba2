package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Rolling last-N context per key via `transformWithState` LIST state —
  * the third state primitive (ValueState: [[TtlDedup]], MapState:
  * [[WindowedHeavyHitters]], ListState: here).
  *
  * Each arriving event is enriched with statistics over the key's N most
  * recent PRIOR events (count / mean / max of `value`) — the streaming
  * form of the enrichment the reference gets from its batch as-of join
  * (each candidate annotated from the observations that preceded it).
  * State per key is exactly the retained tail: O(keys x N), RocksDB-held,
  * independent of stream length.
  */
object RecentEvents {

  final case class Ev(key: Long, seq: Long, value: Double)
  final case class Enriched(key: Long, seq: Long, value: Double,
                            n_prior: Long, mean_prior: Double, max_prior: Double)

  class Processor(retain: Int) extends StatefulProcessor[Long, Ev, Enriched] {
    @transient private var tail: ListState[Ev] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      tail = getHandle.getListState[Ev]("tail", Encoders.product[Ev], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 tv: TimerValues): Iterator[Enriched] = {
      // within a batch, process in deterministic arrival (seq) order
      val out = rows.toSeq.sortBy(_.seq).map { ev =>
        val prior = tail.get().toArray
        val enriched =
          if (prior.isEmpty) Enriched(key, ev.seq, ev.value, 0L, 0.0, 0.0)
          else Enriched(key, ev.seq, ev.value, prior.length.toLong,
            prior.map(_.value).sum / prior.length, prior.map(_.value).max)
        val next = (prior :+ ev).takeRight(retain)
        tail.put(next)
        enriched
      }
      out.iterator
    }
  }

  def enrich(events: Dataset[Ev], retain: Int): Dataset[Enriched] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new Processor(retain),
        TimeMode.None(), OutputMode.Append())
  }
}
