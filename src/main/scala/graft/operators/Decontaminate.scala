package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/test DECONTAMINATION — remove training documents that overlap an
  * evaluation benchmark, the n-gram rule every serious LLM data pipeline
  * applies (public method: GPT-3 appendix C / PaLM-style 13-gram overlap;
  * re-derived for Spark with this engine's shingle kernel).
  *
  * Scale shape: the benchmark side is eval suites — thousands of
  * documents, megabytes — so its DISTINCT shingle set BROADCASTS, and the
  * corpus side is a map-side broadcast join over exploded shingles plus
  * one partial-agged count per contaminated doc. The 100 TB corpus is
  * never shuffled; bytes shuffled scale with CONTAMINATED rows only.
  * Shingles come from the codegen'd `word_shingles` kernel (distinct,
  * sorted), so per-(doc, gram) rows need no extra dedup.
  */
object Decontaminate {

  private def q(n: String): Column = col(s"`$n`")

  private def grams(df: DataFrame, textCol: String, idOpt: Option[String], n: Int): DataFrame = {
    val base = df.where(q(textCol).isNotNull && length(trim(q(textCol))) > 0)
    val g = explode(graft.functions.SketchExpressions.wordShingles(q(textCol), n)).as("g")
    idOpt match {
      case Some(id) => base.select(q(id).as("id"), g)
      case None     => base.select(g).distinct()
    }
  }

  /** Per-document contamination evidence: (id, n_hits) — how many DISTINCT
    * word n-grams of the document appear anywhere in the benchmark.
    * Documents with zero hits are absent.
    */
  def contaminationHits(
      corpus: DataFrame, textCol: String, idCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 3
  ): DataFrame = {
    val bench = grams(benchmark, benchTextCol, None, n)
    grams(corpus, textCol, Some(idCol), n)
      .join(broadcast(bench), "g")
      .groupBy("id")
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The decontaminated corpus: rows whose document shares NO word n-gram
    * with the benchmark (anti-join on the hit set — corpus columns pass
    * through untouched).
    *
    * The BENCHMARK shingle set is bounded by construction (eval suites),
    * so [[contaminationHits]] force-broadcasts it. The HIT set is not: on
    * a heavily contaminated corpus it scales with the corpus, and a forced
    * `broadcast()` hint would bypass Spark's size threshold — driver OOM
    * instead of a plan change. So the anti-join carries no hint: AQE
    * broadcasts it when its runtime size is under the threshold (the
    * common case) and falls back to a shuffled anti-join when it isn't.
    */
  def clean(
      corpus: DataFrame, textCol: String, idCol: String,
      benchmark: DataFrame, benchTextCol: String,
      n: Int = 3
  ): DataFrame = {
    val hits = contaminationHits(corpus, textCol, idCol, benchmark, benchTextCol, n)
      .select(col("id").as("__contaminated_id"))
    corpus.join(hits, q(idCol) === col("__contaminated_id"), "left_anti")
  }
}
