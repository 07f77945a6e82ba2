package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring — the shape of CCNet's
  * perplexity filter (Wenzek et al., LREC'20) with the KenLM replaced by a
  * corpus-trained unigram model: documents whose tokens are improbable
  * under the background distribution (gibberish, boilerplate codes, wrong
  * language) score low and get filtered.
  *
  * Two stages, both linear:
  *   1. TRAIN: one hash aggregation over exploded tokens builds the
  *      unigram table p(t) = c(t) / N; the table is vocabulary-sized.
  *      Unseen tokens take the CALLER-SUPPLIED `oovLogp` floor at score
  *      time (pick e.g. log10(1/(N+|V|)) for add-one-style mass).
  *   2. SCORE: explode -> join the table -> per-doc mean of log10 p(t).
  *      The join side is NOT force-broadcast: a curated vocabulary is
  *      metadata-sized and AQE broadcasts it on its own, but a web-scale
  *      corpus's whitespace-token vocabulary is unbounded (typos, URLs,
  *      ids) — forcing the hint would bypass Spark's size threshold and
  *      OOM the driver instead of degrading to a shuffled hash join.
  *      One shuffle on the doc id; the corpus is never joined against
  *      itself.
  *
  * At 100 TB the table is trained once offline on a sample and reused —
  * the scoring pass is the only full-corpus scan.
  */
object LmScore {

  private def toks(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Unigram table (token, logp) with log10 probabilities. */
  def trainUnigram(df: DataFrame, textCol: String): DataFrame = {
    val t = df.where(col(s"`$textCol`").isNotNull)
      .select(explode(toks(col(s"`$textCol`"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val totalRow = t.agg(sum("c")).head()
    require(!totalRow.isNullAt(0) && totalRow.getLong(0) > 0,
      "trainUnigram needs a corpus with at least one token")
    val total = totalRow.getLong(0)
    t.select(col("token"), log10(col("c").cast("double") / total).as("logp"))
  }

  /** Per-document mean token log-probability under `unigram`. Unseen
    * tokens take the floor `log10(1/(N+1))`-style penalty passed in
    * `oovLogp`. Blank docs score the floor (nothing to attest quality).
    *
    * The unigram join carries NO broadcast hint: AQE broadcasts a small
    * vocabulary automatically and falls back to a shuffled join when the
    * vocabulary is too large to ship — the safe default at corpus scale.
    */
  def scoreDocs(df: DataFrame, textCol: String, idCol: String,
                unigram: DataFrame, oovLogp: Double): DataFrame = {
    val exploded = df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"), explode(toks(col(s"`$textCol`"))).as("token"))
    val scored = exploded.join(unigram, Seq("token"), "left")
      .groupBy("id")
      .agg(avg(coalesce(col("logp"), lit(oovLogp))).as("mean_logp"),
        count(lit(1)).as("n_tokens"))
    // blank/whitespace docs produced no exploded rows — re-attach at floor
    df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("mean_logp"), lit(oovLogp)).as("mean_logp"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
