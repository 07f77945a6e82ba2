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

    override def reduce(buf: SampleBuf, v: RankedId): SampleBuf = {
      val merged = (v +: buf.items).sortBy(_.rank)
      SampleBuf(if (merged.length > k) merged.take(k) else merged)
    }

    override def merge(a: SampleBuf, b: SampleBuf): SampleBuf = {
      val merged = (a.items ++ b.items).sortBy(_.rank)
      SampleBuf(if (merged.length > k) merged.take(k) else merged)
    }

    override def finish(buf: SampleBuf): Sampled = Sampled(buf.items.map(_.id))

    override def bufferEncoder: Encoder[SampleBuf] = Encoders.product[SampleBuf]
    override def outputEncoder: Encoder[Sampled]   = Encoders.product[Sampled]
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
