package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics operators that need aggregation (the per-row signals
  * live in `graft.functions.TextFns` / the `text_metrics` kernel).
  */
object TextStats {

  /** Gopher-style repetition signal: the fraction of a document's word
    * n-grams taken by its single most frequent n-gram. Machine-generated /
    * boilerplate text repeats phrases; the Gopher rules drop documents
    * whose top 2-gram exceeds ~0.2 of all 2-grams.
    *
    * Shape: the positional n-gram generator (non-distinct — counts matter
    * here, unlike shingle sets) explodes map-side; two hash aggregations
    * (doc×ngram, then doc), both map-side combinable. No windows, no
    * driver state.
    */
  def topNgramFraction(df: DataFrame, textCol: String, idCol: String,
                       n: Int): DataFrame = {
    val counts = df
      .where(col(s"`$textCol`").isNotNull && length(trim(col(s"`$textCol`"))) > 0)
      .select(col(s"`$idCol`").as("id"), expr(s"ngram_tuples(`$textCol`, $n)"))
      .groupBy("id", "ngram").agg(count(lit(1)).as("c"))
    counts.groupBy("id").agg(
      sum(col("c")).as("n_ngrams"),
      (max(col("c")).cast("double") / sum(col("c"))).as("top_fraction"))
  }
}
