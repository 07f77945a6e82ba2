package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic per-group sampling via a typed `Aggregator` — the
  * SURVEY §2.11 Aggregator idiom, with a real scale story: ranking rows by
  * a content hash and keeping the k smallest IS a uniform sample, and doing
  * it in an Aggregator gives map-side partial aggregation (each partition
  * ships at most k rows per group) instead of the window-function
  * formulation's full shuffle of every row.
  *
  * Rank = md5 of the id rendered as a string — deterministic, seedless,
  * portable (a DuckDB oracle reproduces it bit-for-bit).
  */
object GroupSample {

  final case class RankedId(rank: String, id: Long)
  final case class SampleBuf(items: Seq[RankedId])
  final case class Sampled(ids: Seq[Long])

  final class TopKByRank(k: Int) extends Aggregator[RankedId, SampleBuf, Sampled] {
    override def zero: SampleBuf = SampleBuf(Nil)

    // Invariant: `items` is always sorted ascending by rank and has ≤ k
    // entries, so reduce can reject a losing row with ONE comparison against
    // the current max and zero allocation. The common case (row loses) is
    // O(1); a winning row pays one O(k) splice. The old formulation sorted
    // the whole buffer per input row (O(k log k) + allocation every row).
    override def reduce(buf: SampleBuf, v: RankedId): SampleBuf = {
      val items = buf.items
      if (items.length < k) SampleBuf(insertSorted(items, v))
      else if (v.rank < items.last.rank) SampleBuf(insertSorted(items, v).take(k))
      else buf
    }

    override def merge(a: SampleBuf, b: SampleBuf): SampleBuf = {
      if (a.items.isEmpty) b
      else if (b.items.isEmpty) a
      else {
        // Both sides sorted → linear merge, cap at k.
        val out   = Seq.newBuilder[RankedId]
        var (i, j, n) = (0, 0, 0)
        val (xs, ys)  = (a.items, b.items)
        while (n < k && (i < xs.length || j < ys.length)) {
          if (j >= ys.length || (i < xs.length && xs(i).rank <= ys(j).rank)) {
            out += xs(i); i += 1
          } else { out += ys(j); j += 1 }
          n += 1
        }
        SampleBuf(out.result())
      }
    }

    private def insertSorted(items: Seq[RankedId], v: RankedId): Seq[RankedId] = {
      val idx = items.indexWhere(_.rank > v.rank) match {
        case -1 => items.length
        case i  => i
      }
      (items.take(idx) :+ v) ++ items.drop(idx)
    }

    override def finish(buf: SampleBuf): Sampled = Sampled(buf.items.map(_.id))

    override def bufferEncoder: Encoder[SampleBuf] = Encoders.product[SampleBuf]
    override def outputEncoder: Encoder[Sampled]   = Encoders.product[Sampled]
  }

  final case class ScoredId(score: Double, id: Long)
  final case class ScoreBuf(items: Seq[ScoredId])
  final case class TopScored(items: Seq[ScoredId])

  /** Exact top-k BY SCORE per group (ties break to the smaller id) — the
    * "keep each domain's k best documents" selection. Same mergeable
    * bounded-k sorted-buffer shape as [[TopKByRank]]: each partition
    * ships at most k rows per group (map-side partial aggregation), vs
    * the window-function formulation shuffling every row to rank it.
    */
  final class TopKByScore(k: Int) extends Aggregator[ScoredId, ScoreBuf, TopScored] {
    // better-than: higher score first, smaller id on ties
    private def beats(a: ScoredId, b: ScoredId): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: ScoreBuf = ScoreBuf(Nil)

    override def reduce(buf: ScoreBuf, v: ScoredId): ScoreBuf = {
      val items = buf.items
      if (items.length < k) ScoreBuf(insertSorted(items, v))
      else if (beats(v, items.last)) ScoreBuf(insertSorted(items, v).take(k))
      else buf
    }

    override def merge(a: ScoreBuf, b: ScoreBuf): ScoreBuf = {
      if (a.items.isEmpty) b
      else if (b.items.isEmpty) a
      else {
        val out = Seq.newBuilder[ScoredId]
        var (i, j, n) = (0, 0, 0)
        val (xs, ys) = (a.items, b.items)
        while (n < k && (i < xs.length || j < ys.length)) {
          if (j >= ys.length || (i < xs.length && !beats(ys(j), xs(i)))) {
            out += xs(i); i += 1
          } else { out += ys(j); j += 1 }
          n += 1
        }
        ScoreBuf(out.result())
      }
    }

    private def insertSorted(items: Seq[ScoredId], v: ScoredId): Seq[ScoredId] = {
      val idx = items.indexWhere(x => beats(v, x)) match {
        case -1 => items.length
        case i  => i
      }
      (items.take(idx) :+ v) ++ items.drop(idx)
    }

    override def finish(buf: ScoreBuf): TopScored = TopScored(buf.items)

    override def bufferEncoder: Encoder[ScoreBuf]  = Encoders.product[ScoreBuf]
    override def outputEncoder: Encoder[TopScored] = Encoders.product[TopScored]
  }

  /** Keep the `k` highest-scoring rows per group (score desc, id asc).
    * Rows with a NULL or NaN score, or a NULL id, are excluded — they
    * cannot be ranked, and engines disagree on NULL/NaN sort placement,
    * so excluding them is the only cross-engine-stable contract.
    *
    * @return (grp, id, score) — one row per kept id.
    */
  def topKPerGroupByScore(df: DataFrame, groupCol: String, idCol: String,
                          scoreCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.where(col(s"`$scoreCol`").isNotNull && !isnan(col(s"`$scoreCol`").cast("double")) &&
        col(s"`$idCol`").isNotNull)
      .select(col(s"`$groupCol`").cast("string").as("grp"),
        col(s"`$scoreCol`").cast("double").as("score"),
        col(s"`$idCol`").cast("long").as("id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => ScoredId(t._2, t._3))
      .agg(new TopKByScore(k).toColumn.name("top"))
      .toDF("grp", "top")
      .select(col("grp"), explode(col("top.items")).as("it"))
      .select(col("grp"), col("it.id").as("id"), col("it.score").as("score"))
  }

  /** Sample up to `k` ids per group, deterministically.
    *
    * @return (grp, id) — one row per sampled id.
    */
  def sampleKPerGroup(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(s"`$groupCol`").cast("string").as("grp"),
        md5(col(s"`$idCol`").cast("string")).as("rank"),
        col(s"`$idCol`").cast("long").as("id"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues(t => RankedId(t._2, t._3))
      .agg(new TopKByRank(k).toColumn.name("sample"))
      .toDF("grp", "sample")
      .select(col("grp"), explode(col("sample.ids")).as("id"))
  }
}
