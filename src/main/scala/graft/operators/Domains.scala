package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-level corpus controls: per-domain caps and domain-stratified
  * mixing over a host column (extract it with
  * [[graft.functions.UrlFns.urlHost]]). Web corpora are wildly
  * host-skewed — a handful of domains contribute most of a crawl — so
  * a release pipeline caps and re-weights BY DOMAIN before any
  * content-level scoring sees the data (the CCNet/C4/RefinedWeb
  * ordering).
  */
object Domains {

  /** Keep at most `cap` docs per domain, deterministically (lowest
    * `idCol` first — re-runs and re-partitionings keep the same rows).
    *
    * Shape: one shuffle on the host key; `row_number` streams each
    * group, so a mega-domain costs its row count, never its square, and
    * nothing is materialized per group. For a domain so hot its rows
    * overwhelm one partition, thin it FIRST with a cheap map-side
    * hash-sample ([[Sampling.byHashPredicate]]) sized generously above
    * `cap`, then apply the exact cap — same result, bounded partition.
    */
  def perDomainCap(docs: DataFrame, hostCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(col(s"`$hostCol`")).orderBy(col(s"`$idCol`"))
    docs.withColumn("__dom_rn", row_number().over(w))
      .where(col("__dom_rn") <= cap)
      .drop("__dom_rn")
  }

  /** Domain-stratified MIXING: each domain keeps its own deterministic
    * hash fraction ("10% of blogspot, all of arxiv, 2% of everything
    * else") — [[Sampling.stratifiedByHash]] keyed on the host column.
    * One map-side CASE predicate: zero shuffle, reproducible across
    * runs and corpus growth.
    */
  def domainStratifiedSample(
      docs: DataFrame, hostCol: String, idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame =
    Sampling.stratifiedByHash(docs, hostCol, idCol, fractions, defaultFraction)
}
