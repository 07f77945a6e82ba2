package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy hitters as a MERGEABLE typed `Aggregator` — bounded
  * memory frequent-items over an unbounded token stream, the corpus-
  * frequency primitive (frequent tokens / n-grams / URLs) at 100 TB.
  *
  * Guarantees (Misra & Gries '82; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS'12): with capacity k over n items, every
  * estimate satisfies `true - n/(k+1) <= est <= true`, so any item with
  * frequency > n/(k+1) is guaranteed present. With k >= |vocabulary| no
  * decrement ever fires and counts are EXACT — which is what the DuckDB
  * oracle (q58) checks; the lossy regime's bound is spec-checked
  * separately.
  *
  * Scale shape: the Aggregator gives map-side partial aggregation — each
  * partition ships one k-entry summary, not its token stream; merges are
  * associative and ordering-insensitive within the error bound. Contrast
  * with exact groupBy(token): one shuffle row per DISTINCT token — fine
  * for word counts, unbounded for n-gram or URL vocabularies.
  */
object HeavyHitters {

  final case class TokCount(tok: String, n: Long)
  final case class MGBuf(items: Map[String, Long])

  final case class Hitters(items: Seq[TokCount])

  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuf, Hitters] {
    require(k > 0)

    override def zero: MGBuf = MGBuf(Map.empty)

    override def reduce(buf: MGBuf, tok: String): MGBuf =
      buf.items.get(tok) match {
        case Some(c) => MGBuf(buf.items.updated(tok, c + 1L))
        case None if buf.items.size < k => MGBuf(buf.items.updated(tok, 1L))
        case None =>
          // classic MG decrement: all counters -1, drop zeros
          MGBuf(buf.items.flatMap { case (t, c) =>
            if (c > 1L) Some(t -> (c - 1L)) else None
          })
      }

    override def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val summed = b.items.foldLeft(a.items) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (summed.size <= k) MGBuf(summed)
      else {
        // mergeable-summaries rule: subtract the (k+1)-th largest count
        // from every counter, keep positives (<= k survive)
        val cut = summed.values.toSeq.sortBy(-_).apply(k)
        MGBuf(summed.flatMap { case (t, c) =>
          if (c > cut) Some(t -> (c - cut)) else None
        })
      }
    }

    override def finish(buf: MGBuf): Hitters =
      Hitters(buf.items.toSeq.sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => TokCount(t, c) })

    override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    override def outputEncoder: Encoder[Hitters] = Encoders.product[Hitters]
  }

  /** Top `topN` whitespace tokens of `textCol` by MG estimate
    * (capacity `k`), globally. Deterministic output order
    * (count desc, token asc).
    */
  def frequentTokens(df: DataFrame, textCol: String, k: Int, topN: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(explode(TextFns.tokens(col(s"`$textCol`"))).as("tok"))
      .as[String]
      .groupByKey(_ => 0)
      .agg(new MisraGries(k).toColumn.name("hh"))
      .flatMap { case (_, hh) => hh.items.take(topN) }
      .toDF("token", "n")
      .orderBy(col("n").desc, col("token").asc)
  }
}
