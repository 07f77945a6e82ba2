package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-corpus construction.
  *
  * `df.sample()` is seed-dependent per partition layout — re-running a
  * pipeline or re-partitioning the corpus yields a DIFFERENT sample, which
  * breaks reproducible dataset builds. Hash sampling keys the decision on
  * the ROW (md5 of its id), so the sample is a pure function of the data:
  * stable across runs, partitionings, engines (the DuckDB oracle mirrors
  * it verbatim), and incrementally consistent (a doc's in/out decision
  * never changes as the corpus grows — exactly what an append-only
  * training-data pipeline needs). Uniform within every stratum by
  * construction, so stratified sampling needs no per-stratum machinery.
  * Zero shuffle: the predicate is map-side.
  */
object Sampling {

  /** 32-hex-digit threshold such that P[md5(x) < threshold] = fraction
    * under the uniform-hex-string model (base-16 expansion of the
    * fraction).
    */
  def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0)
    val sb = new StringBuilder
    var f = BigDecimal(fraction)   // exact base-16 expansion, no FP drift
    (1 to 32).foreach { _ =>
      f *= 16
      val d = math.min(15, f.toInt)
      sb.append(java.lang.Integer.toHexString(d))
      f -= d
    }
    sb.toString
  }

  /** Keep each row with probability `fraction`, deterministically keyed on
    * `idCol`. Map-side filter; survives re-partitioning and re-runs.
    */
  def byHash(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.where(md5(col(s"`$idCol`").cast("string")) < lit(hexThreshold(fraction)))

  /** The sampling predicate as a Column (for composing into larger
    * filters without materializing an intermediate frame).
    */
  def byHashPredicate(idCol: Column, fraction: Double): Column =
    md5(idCol.cast("string")) < lit(hexThreshold(fraction))

  /** WEIGHTED STRATIFIED sampling — the corpus-MIXING primitive of a
    * training-data pipeline ("30% of web, 100% of books, 5% of logs"):
    * each stratum keeps its own deterministic hash fraction, as one
    * map-side CASE predicate over the broadcast-free weights literal.
    * Strata absent from `fractions` fall back to `defaultFraction`
    * (0 = drop unknown sources — the safe default for curated mixes).
    * Same reproducibility contract as [[byHash]]: the decision is a pure
    * function of (id, stratum weights); re-partitioning, re-running, or
    * growing the corpus never flips a row, so mixture re-builds are
    * incremental by construction. Zero shuffle.
    */
  def stratifiedByHash(
      df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0
  ): DataFrame = {
    val h = md5(col(s"`$idCol`").cast("string"))
    val pred = fractions.toSeq.sortBy(_._1).foldLeft(
      when(lit(false), lit(false))) { case (acc, (stratum, f)) =>
        acc.when(col(s"`$strataCol`") === stratum, h < lit(hexThreshold(f)))
      }.otherwise(h < lit(hexThreshold(defaultFraction)))
    df.where(pred)
  }
}
