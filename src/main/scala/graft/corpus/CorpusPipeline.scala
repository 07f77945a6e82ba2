package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Dedup

/** End-to-end training-corpus preparation: annotate -> quality filter ->
  * exact dedup -> near-dup cluster removal. The composite that ties the
  * text-analysis + dedup operator families together, shaped for 100 TB:
  * every stage is one scan or one keyed shuffle, near-dup clustering works
  * on LSH-blocked pairs + label propagation (never all-pairs), and the
  * representative kept per cluster is deterministic (min doc id).
  */
object CorpusPipeline {

  final case class Config(
      textCol: String = "text",
      idCol: String = "doc_id",
      minTokens: Int = 5,
      minQuality: Double = 0.3,
      nearDupThreshold: Double = 0.8,
      shingleN: Int = 3)

  final case class Stats(
      input: Long,
      afterQuality: Long,
      afterExactDedup: Long,
      afterNearDedup: Long)

  final case class Result(corpus: DataFrame, stats: Stats)

  private def c(n: String): Column = col(s"`$n`")

  /** Stage 1: single-scan annotation with every text signal — tokenizes
    * ONCE ([[TextFns.tokenMetrics]]) instead of re-splitting inside each
    * metric expression.
    */
  def annotate(df: DataFrame, cfg: Config): DataFrame = {
    val t = c(cfg.textCol)
    val m = df
      .withColumn("__m", TextFns.tokenMetrics(TextFns.tokens(t)))
      .withColumn("__punct", TextFns.punctRatio(t))
    m.withColumn("n_tokens", col("__m.n_tokens"))
      .withColumn("quality", round(
        least(col("__m.n_tokens").cast("double") / 20.0d, lit(1.0d)) * 0.5d +
          greatest(lit(0.0d), lit(1.0d) - col("__punct") * 4.0d) * 0.25d +
          least(col("__m.stopword_ratio") * 5.0d, lit(1.0d)) * 0.25d, 6))
      .withColumn("lang_pred", col("__m.lang_pred"))
      .withColumn("fingerprint", TextFns.fingerprint(t))
      .drop("__m", "__punct")
  }

  def run(docs: DataFrame, cfg: Config = Config()): Result = {
    val input = docs.where(c(cfg.textCol).isNotNull)
    val annotated = annotate(input, cfg).cache()

    val filtered = annotated
      .where(col("n_tokens") >= cfg.minTokens && col("quality") >= cfg.minQuality)
      .cache()

    // Exact dedup: keep min-id representative per normalized fingerprint.
    val exact = Dedup.keepFirst(filtered, Seq("fingerprint"), Seq(c(cfg.idCol).asc))
      .cache()

    // Near-dup clusters: LSH-blocked pairs -> connected components -> keep
    // the cluster-min id.
    val pairs = Dedup.minhashLshPairs(exact, cfg.textCol, cfg.idCol,
      shingleN = cfg.shingleN, threshold = cfg.nearDupThreshold)
    val clusters = Dedup.connectedComponents(pairs)
    val dropIds = clusters.where(col("id") =!= col("label")).select("id")
    val corpus = exact.join(dropIds, exact(cfg.idCol) === dropIds("id"), "left_anti")

    Result(corpus, Stats(
      input = input.count(),
      afterQuality = filtered.count(),
      afterExactDedup = exact.count(),
      afterNearDedup = corpus.count()))
  }
}
