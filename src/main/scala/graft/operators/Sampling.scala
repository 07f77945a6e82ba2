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

  /** TOKEN-BUDGET stratified sampling — fill each stratum to a token
    * budget in deterministic hash order ("2B tokens of web, 500M of
    * code"): the mixture primitive when targets are TOKEN shares, not
    * row fractions (rows are a poor proxy when doc lengths differ
    * across sources). A row is kept iff the cumulative `lenCol` of its
    * stratum's (md5(id), id)-ordered prefix, the row itself included,
    * stays within the stratum's budget.
    *
    * Deterministic and engine-reproducible (pure function of data +
    * budgets; the DuckDB oracle mirrors it as a window cumsum) but —
    * unlike [[byHash]] — NOT append-stable: budget filling is
    * prefix-dependent by definition, so re-filling after corpus growth
    * can rotate the tail. Fraction sampling keeps decisions stable;
    * budget sampling keeps the TOTAL stable. Pick per use case.
    *
    * Scale shape (the [[graft.operators.Packing]] prefix-sum idea
    * applied per stratum — a naive window over each stratum would sort
    * every stratum in ONE partition):
    *   1. each row keys to one of 256 hash-prefix buckets (map-side);
    *   2. per-(stratum, bucket) token sums — one partial-agged keyed
    *      shuffle producing strata×256 rows;
    *   3. bucket prefix sums over that tiny aggregate classify each
    *      bucket: fully inside the budget (rows pass with no sort),
    *      fully outside (rows drop at the broadcast join), or the ONE
    *      boundary bucket per stratum;
    *   4. only boundary-bucket rows (~1/256 of a stratum) sort at doc
    *      granularity — the stratum never funnels through a partition.
    */
  def byTokenBudget(
      df: DataFrame, strataCol: String, idCol: String, lenCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The working columns below live in the caller's namespace until the
    // final re-select; a colliding input column would be silently
    // overwritten (corrupting the caller's data), so refuse instead.
    require(df.columns.forall(!_.startsWith("__tb_")),
      s"byTokenBudget reserves the __tb_ column prefix; input has " +
        df.columns.filter(_.startsWith("__tb_")).mkString(", "))
    val st = col(s"`$strataCol`")
    val id = col(s"`$idCol`")
    val len = coalesce(col(s"`$lenCol`").cast("long"), lit(0L))
    // hex chars sort 0-9 < a-f in ASCII, so ordering by the bucket index
    // (first 2 hex digits) then the full hash IS the hash order.
    val withKeys = df
      .withColumn("__tb_h", md5(id.cast("string")))
      .withColumn("__tb_b", conv(substring(col("__tb_h"), 1, 2), 16, 10).cast("int"))
    val budgetOf = budgets.toSeq.sortBy(_._1).foldLeft(when(lit(false), lit(0L))) {
      case (acc, (stratum, b)) => acc.when(col("__tb_s") === stratum, lit(b))
    }.otherwise(lit(defaultBudget))
    val wBucket = Window.partitionBy("__tb_s").orderBy("__tb_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val meta = withKeys
      .groupBy(st.as("__tb_s"), col("__tb_b")).agg(sum(len).as("__tb_sum"))
      .withColumn("__tb_before", coalesce(sum(col("__tb_sum")).over(wBucket), lit(0L)))
      .withColumn("__tb_budget", budgetOf)
      .withColumn("__tb_keep_all",
        col("__tb_before") + col("__tb_sum") <= col("__tb_budget"))
      .withColumn("__tb_boundary",
        !col("__tb_keep_all") && col("__tb_before") < col("__tb_budget"))
      .where(col("__tb_keep_all") || col("__tb_boundary"))
    // Null-safe stratum equality: a NULL stratum is a legitimate group
    // (it gets defaultBudget, matching the defining window's NULL
    // partition) — a plain equi-join would silently drop every such row.
    val joined = withKeys.as("r").join(broadcast(meta.as("m")),
        col(s"r.`$strataCol`") <=> col("m.__tb_s") &&
          col("r.__tb_b") === col("m.__tb_b"))
      .select(df.columns.map(c => col(s"r.`$c`")) ++ Seq(
        col("r.__tb_h"), col("r.__tb_b").as("__tb_bb"), col("m.__tb_before"),
        col("m.__tb_budget"), col("m.__tb_keep_all"), col("m.__tb_boundary")): _*)
    val wDoc = Window.partitionBy(st, col("__tb_bb")).orderBy(col("__tb_h"), id)
    val kept = joined.where(col("__tb_keep_all"))
      .unionByName(joined.where(col("__tb_boundary"))
        .withColumn("__tb_cum", sum(len).over(wDoc))
        .where(col("__tb_before") + col("__tb_cum") <= col("__tb_budget"))
        .drop("__tb_cum"))
    kept.select(df.columns.map(c => col(s"`$c`")): _*)
  }
}
