package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming per-domain cap: the arrival-order counterpart of
  * [[graft.operators.Domains.perDomainCap]] (whose lowest-id-first rule
  * is a BATCH construct — a stream cannot wait for the smallest id).
  * Docs stream in; each host keeps its first `cap` arrivals and drops
  * the rest, and every input emits a verdict row (`kept`, running
  * kept/seen counts) so downstream either filters `kept` (the capped
  * corpus) or monitors per-domain pressure — the ingestion guard a
  * crawl feed needs BEFORE content-level dedup sees a mega-domain.
  *
  * Deterministic given arrival order: within a micro-batch each host's
  * rows process in ascending `doc_id` (buffered and sorted —
  * micro-batch-bounded, the [[StreamingBudgetFill]] convention), so a
  * stream delivered in id order reproduces the batch operator exactly
  * (spec-pinned). State per host is two longs in a RocksDB-backed
  * ValueState — O(hosts), disk-spillable, restart-safe.
  */
object StreamingDomainCap {

  final case class Doc(host: String, doc_id: Long)
  final case class Verdict(host: String, doc_id: Long, kept: Boolean,
                           n_kept: Long, n_seen: Long)
  final case class Counts(seen: Long, kept: Long)

  class CapProcessor(caps: Map[String, Int], defaultCap: Int)
      extends StatefulProcessor[String, Doc, Verdict] {
    @transient private var counts: ValueState[Counts] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getValueState[Counts]("counts",
        Encoders.product[Counts], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Doc],
                                 tv: TimerValues): Iterator[Verdict] = {
      val cap = caps.getOrElse(key, defaultCap)
      var st = if (counts.exists()) counts.get() else Counts(0L, 0L)
      val out = rows.toArray.sortBy(_.doc_id).map { d =>
        val kept = st.kept < cap
        st = Counts(st.seen + 1, if (kept) st.kept + 1 else st.kept)
        Verdict(key, d.doc_id, kept, st.kept, st.seen)
      }
      counts.update(st)
      out.iterator
    }
  }

  /** Wire: group the doc stream by host, run the stateful cap.
    * `caps` overrides the default per host ("this domain gets 10k,
    * everything else 100"). TimeMode.None — capping is an
    * arrival-order concept using no timers, and a processing-time
    * stateful operator makes every trigger a potential timer-firing
    * batch, which under `Trigger.AvailableNow` keeps scheduling
    * no-data micro-batches forever after a file source drains.
    */
  def verdicts(docs: Dataset[Doc], defaultCap: Int,
               caps: Map[String, Int] = Map.empty): Dataset[Verdict] = {
    import docs.sparkSession.implicits._
    require(defaultCap >= 0 && caps.values.forall(_ >= 0),
      "caps must be non-negative")
    docs.groupByKey(_.host)
      .transformWithState(new CapProcessor(caps, defaultCap),
        TimeMode.None(), OutputMode.Append())
  }
}
