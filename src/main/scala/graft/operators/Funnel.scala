package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis: how far each user progressed through an ORDERED
  * sequence of event types (view → click → purchase), where later steps
  * must occur after earlier ones (subsequence, not adjacency).
  *
  * Shape: one hash aggregation per user collecting the time-ordered event
  * letters, then a per-row regex subsequence test per funnel prefix — no
  * windows, no self-join chain (the naive k-step funnel is k-1 self-joins,
  * each a shuffle; this is ONE shuffle regardless of k). Per-user state is
  * the letter string (bounded by that user's event count).
  *
  * Determinism: events ordered by (ts, idCol) so equal timestamps break
  * ties stably — the DuckDB oracle mirrors the same ordered aggregation.
  */
object Funnel {

  private def letter(i: Int): String = ('a' + i).toChar.toString

  /** Per-user funnel stage: 0 = entered nothing, k = completed the first k
    * steps in order. Returns (userCol, stage).
    */
  def stages(df: DataFrame, userCol: String, tsCol: String, idCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.size <= 26)
    val lit0 = steps.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (s, i)) => when(col(s"`$typeCol`") === s, lit(letter(i))).otherwise(acc)
    }
    val seqStr = array_join(
      transform(
        array_sort(collect_list(struct(col(s"`$tsCol`").as("ts"),
          col(s"`$idCol`").as("id"), col("__l").as("l")))),
        x => x.getField("l")), "")
    val perUser = df
      .where(col(s"`$typeCol`").isin(steps: _*))
      .withColumn("__l", lit0)
      .groupBy(col(s"`$userCol`"))
      .agg(seqStr.as("__seq"))
    // stage = longest completed prefix; deeper prefixes tested first so the
    // first match wins.
    val prefixRegexes = steps.indices.map { k =>
      (0 to k).map(i => letter(i)).mkString(".*")
    }
    val stageExpr = prefixRegexes.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (re, k)) =>
        when(col("__seq").rlike(re), lit(k + 1)).otherwise(acc)
    }
    perUser.select(col(s"`$userCol`"), stageExpr.as("stage"))
  }

  /** Stage-completion counts: for each funnel depth k, how many users
    * completed at least the first k steps (the classic funnel chart).
    */
  def funnelCounts(df: DataFrame, userCol: String, tsCol: String, idCol: String,
                   typeCol: String, steps: Seq[String]): DataFrame = {
    val s = stages(df, userCol, tsCol, idCol, typeCol, steps)
    val total = steps.size
    s.select(explode(sequence(lit(1L), lit(total.toLong))).as("stage_k"), col("stage"))
      .where(col("stage") >= col("stage_k"))
      .groupBy("stage_k").agg(count(lit(1)).as("n_users"))
  }
}
