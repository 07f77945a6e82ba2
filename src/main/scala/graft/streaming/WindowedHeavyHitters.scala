package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._
import graft.functions.HeavyHitters

/** Windowed frequent tokens on `transformWithState` with MAP state and
  * EVENT-TIME TIMERS: per tumbling window, a bounded Misra-Gries summary
  * ([[graft.functions.HeavyHitters]] — same merge-free reduce, applied
  * through `MapState`) accumulates token counts; when the watermark passes
  * window end, a registered timer fires, the top-N is emitted ONCE and the
  * window's state is dropped.
  *
  * The streaming complement of batch q58: "what's trending per hour" over
  * an unbounded token stream with O(windows-in-flight x capacity) state —
  * capacity bounds memory per window regardless of vocabulary size, the
  * watermark bounds windows in flight, and the RocksDB store holds both.
  */
object WindowedHeavyHitters {

  /** (window start epoch-ms, token) with `event_ms` driving the watermark. */
  final case class Tok(window_ms: Long, event_ms: Long, token: String)
  final case class WindowTop(window_ms: Long, token: String, n: Long)

  class Processor(capacity: Int, topN: Int, windowMs: Long, latenessMs: Long)
      extends StatefulProcessor[Long, Tok, WindowTop] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("mg",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(window: Long, rows: Iterator[Tok],
                                 tv: TimerValues): Iterator[WindowTop] = {
      rows.foreach { t =>
        if (counts.containsKey(t.token))
          counts.updateValue(t.token, counts.getValue(t.token) + 1L)
        else {
          val size = counts.keys().size
          if (size < capacity) counts.updateValue(t.token, 1L)
          else {
            // Misra-Gries decrement across the map state
            counts.iterator().toSeq.foreach { case (k, v) =>
              if (v > 1L) counts.updateValue(k, v - 1L) else counts.removeKey(k)
            }
          }
        }
      }
      // fire once the watermark passes window end (+ lateness)
      getHandle.registerTimer(window + windowMs + latenessMs)
      Iterator.empty
    }

    override def handleExpiredTimer(window: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[WindowTop] = {
      val top = counts.iterator().toSeq
        .sortBy { case (t, n) => (-n, t) }.take(topN)
        .map { case (t, n) => WindowTop(window, t, n) }
      counts.clear()
      top.iterator
    }
  }

  /** Wire: tokens with event time -> tumbling windows -> per-window MG.
    * `docsToTokens` upstream typically explodes
    * [[graft.functions.TextFns.tokens]] and stamps `window_ms =
    * floor(event_ms / windowMs) * windowMs`.
    */
  def run(toks: Dataset[Tok], capacity: Int, topN: Int,
          windowMs: Long, watermarkDelay: String,
          latenessMs: Long = 0L): Dataset[WindowTop] = {
    import toks.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    toks
      .withColumn("__et", timestamp_millis(col("event_ms")))
      .withWatermark("__et", watermarkDelay)
      .as[Tok]
      .groupByKey(_.window_ms)
      .transformWithState(new Processor(capacity, topN, windowMs, latenessMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
