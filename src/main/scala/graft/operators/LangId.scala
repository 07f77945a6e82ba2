package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.LangIdExpr

/** Language identification over a text column — the operator between raw
  * crawl extraction ([[graft.corpus.CrawlPipeline]] / `html_text`) and
  * every per-language corpus stage (datasheets, language tiers, mixture
  * allocation, per-language labels), which all key on a `lang` column
  * real crawl data does not carry. CCNet and C4 both run a langid
  * classifier immediately after extraction; this is that stage.
  *
  * Classification itself is [[graft.functions.LangIdExpr]] — a codegen'd
  * map-side trigram scorer against the fixed in-repo model — so the
  * operator adds ZERO shuffles at any corpus size: the threshold policy
  * here is plain column arithmetic over the scorer's struct.
  */
object LangId {

  /** Raw scores: `langid(text)` → struct<lang, avg_lp, margin, n_tri>. */
  def langid(text: Column): Column = LangIdExpr.langid(text)

  /** Adds `langCol` (ISO-ish code or "und") and `confCol` (the
    * best-vs-runner-up margin in average log-probability) to `docs`.
    *
    * "und" (undetermined) when the evidence does not support a call:
    *  - the text is null or has fewer than `minTrigrams` trigrams
    *    (too short to carry a trigram signature);
    *  - the best average log-probability sits below `minAvgLp` — the
    *    text does not look like ANY known language (gibberish, an
    *    unseen script: every trigram lands on the smoothed OOV floor,
    *    around -8.1 for this model; real matched text sits above -7.1,
    *    so the -7.5 default splits the two regimes cleanly);
    *  - the margin is below `minMargin` (two languages are effectively
    *    tied — heavily mixed text).
    *
    * The confidence column keeps the raw margin (0.0 for null/short
    * text) so downstream stages can re-threshold without re-scoring.
    */
  def classify(
      docs: DataFrame, textCol: String,
      minAvgLp: Double = -7.5, minMargin: Double = 0.0,
      minTrigrams: Int = 1,
      langCol: String = "lang", confCol: String = "lang_conf"): DataFrame = {
    LangIdExpr.register(docs.sparkSession)
    val lid = langid(col(s"`$textCol`"))
    docs.withColumn("__lid", lid)
      .withColumn(langCol,
        when(col("__lid").isNull || col("__lid.n_tri") < minTrigrams ||
            col("__lid.avg_lp") < minAvgLp || col("__lid.margin") < minMargin,
          lit("und"))
          .otherwise(col("__lid.lang")))
      .withColumn(confCol, coalesce(col("__lid.margin"), lit(0.0)))
      .drop("__lid")
  }
}
