package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Targeted data SELECTION — the DSIR shape (Xie et al., NeurIPS'23:
  * importance resampling for language-model data selection), re-derived
  * on this library's LM kernels: score every corpus doc by how much more
  * likely its tokens are under a TARGET-domain model than under the
  * corpus's own background model, then sample the corpus proportionally
  * to that importance ratio. Complements the dedup/quality family: those
  * ask "is this doc good", this asks "is this doc the KIND of data I
  * want more of".
  *
  * Both stages are linear and shuffle-bounded:
  *  - [[dsirWeights]]: ONE token explode over the corpus joined against a
  *    merged two-model table (full-outer union of the target and raw
  *    unigram tables — half the scan cost of scoring twice), one doc-id
  *    aggregation. Neither model join is broadcast-hinted (the
  *    [[LmScore]] rationale: AQE broadcasts curated vocabularies,
  *    degrades to a shuffled join for unbounded ones).
  *  - [[resampleTopK]]: deterministic Gumbel-top-k — adding an i.i.d.
  *    Gumbel noise to each log-weight and taking the top k draws exactly
  *    k docs WITHOUT replacement with probability proportional to
  *    exp(weight / temperature), which for temperature 1 is the
  *    importance ratio p_target/p_raw itself. The noise is seeded from
  *    the doc id (md5), so selection is reproducible, partition-layout
  *    independent, and SQL-mirrorable; the top-k is a TakeOrdered (per-
  *    partition heads, no global sort shuffle).
  *
  * At 100 TB the target model comes from a domain sample (megabytes) and
  * the raw model from an offline pass or sample; the weight pass is the
  * only full-corpus scan, and selection ships k rows.
  */
object Selection {

  /** Per-doc importance weight: mean over tokens of
    * `log10 p_target(t) - log10 p_raw(t)`, unseen tokens flooring at
    * `oovLogp` PER MODEL (so a token unknown to both contributes 0 —
    * no evidence either way). Docs with no tokens weight 0.0.
    *
    * @param targetLm (token, logp) from [[LmScore.trainUnigram]] over the
    *                 target-domain sample
    * @param rawLm    same over the corpus (or a sample of it)
    * @return (id, weight, n_tokens)
    */
  def dsirWeights(corpus: DataFrame, textCol: String, idCol: String,
                  targetLm: DataFrame, rawLm: DataFrame,
                  oovLogp: Double): DataFrame = {
    val toks = when(length(trim(col(s"`$textCol`"))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col(s"`$textCol`")), "\\s+"))
    // One model table, two channels; full outer so a token seen by either
    // model keeps its real probability on that side.
    val merged = targetLm.select(col("token"), col("logp").as("__lp_t"))
      .join(rawLm.select(col("token"), col("logp").as("__lp_r")),
        Seq("token"), "full_outer")
    val scored = corpus.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"), explode(toks).as("token"))
      .join(merged, Seq("token"), "left")
      .groupBy("id")
      .agg(avg(coalesce(col("__lp_t"), lit(oovLogp)) -
          coalesce(col("__lp_r"), lit(oovLogp))).as("weight"),
        count(lit(1)).as("n_tokens"))
    corpus.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("weight"), lit(0.0d)).as("weight"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** Gumbel-top-k importance resampling over a weight frame: draw `k`
    * rows without replacement with P ∝ exp(weight / temperature),
    * deterministically. Each row's key is
    * `weight/temperature − ln(−ln(u))` with `u ∈ (0,1)` derived from
    * md5(id ":" seed) — u is an exact dyadic rational ((v + 0.5)/2³²),
    * so a SQL oracle reproduces the keys bit-for-bit up to `ln`'s last
    * ulp. Ties break by id. `temperature → 0` degenerates toward
    * deterministic top-k by weight; large temperatures toward uniform.
    */
  def resampleTopK(weights: DataFrame, idCol: String, weightCol: String,
                   k: Int, seed: Long, temperature: Double = 1.0): DataFrame = {
    require(k > 0, "k must be positive")
    require(temperature > 0, "temperature must be positive")
    val u = (conv(substring(md5(concat(col(s"`$idCol`").cast("string"),
        lit(":" + seed))), 1, 8), 16, 10).cast("double") + lit(0.5d)) /
      lit(4294967296.0d)
    val key = col(s"`$weightCol`") / lit(temperature) - log(-log(u))
    weights.withColumn("__gk", key)
      .orderBy(col("__gk").desc, col(s"`$idCol`").asc)
      .limit(k)
      .drop("__gk")
  }

  /** End-to-end DSIR selection: train both unigram models, weight the
    * corpus, resample k docs. The convenience composition of the two
    * primitives above (whose parts remain individually reusable —
    * e.g. persist the weights once and resample per-mixture).
    */
  def dsirSelect(corpus: DataFrame, textCol: String, idCol: String,
                 target: DataFrame, targetTextCol: String,
                 k: Int, seed: Long, oovLogp: Double = -12.0,
                 temperature: Double = 1.0): DataFrame = {
    val w = dsirWeights(corpus, textCol, idCol,
      LmScore.trainUnigram(target, targetTextCol),
      LmScore.trainUnigram(corpus, textCol), oovLogp)
    resampleTopK(w, "id", "weight", k, seed, temperature)
  }
}
