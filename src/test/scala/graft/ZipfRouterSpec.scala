package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** The driver's synthetic corpus has a 31-word vocabulary and no Zipf
  * tail, so at bench scale it permanently routes q62 DENSE and never
  * trips the q38 skew guard — the prefix route and the guard fallback
  * only ever ran on fixtures. This spec generates a REALISTIC corpus
  * (Zipf-distributed tokens over a large vocabulary + planted boilerplate
  * phrases) at sf0.01 size and pins that:
  *   - the token-cosine router picks the PREFIX path (plan shows the
  *     token_dot verify kernel, not the dense vec_dot join),
  *   - the Jaccard skew guard TRIPS on the boilerplate shingle (plan
  *     shows the sorted_intersect_size prefix verify),
  *   - both routed results EQUAL their unrouted formulations.
  */
class ZipfRouterSpec extends SparkSuite {
  import spark.implicits._

  /** 500 docs, ~40 tokens each: Zipf(s≈1.1) over a 6000-word vocabulary;
    * 40% of docs open with the same boilerplate phrase (the license-header
    * pattern that makes one shingle's posting list hot).
    */
  private lazy val zipfDocs = {
    val rnd = new scala.util.Random(42)
    val vocab = 6000
    // inverse-CDF Zipf sampling over precomputed cumulative weights
    val weights = Array.tabulate(vocab)(i => 1.0 / math.pow(i + 1.0, 1.1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def draw(): Int = {
      val x = rnd.nextDouble() * total
      val i = java.util.Arrays.binarySearch(cum, x)
      if (i >= 0) i else math.min(vocab - 1, -i - 1)
    }
    val boiler = "all rights reserved see terms below"
    val rows = (0 until 500).map { id =>
      val body = Seq.fill(34 + rnd.nextInt(12))("w" + draw()).mkString(" ")
      val text = if (id % 5 < 2) s"$boiler $body" else body
      (id.toLong, text)
    }
    rows.toDF("doc_id", "text")
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_a"), col("id_b"), round(col(df.columns.last), 9))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("Zipf corpus routes token-cosine to the PREFIX index, result equals the naive join") {
    val routed = Similarity.tokenCosinePairsPrefix(zipfDocs, "text", "doc_id",
      threshold = 0.8)
    val plan = planOf(routed)
    info(s"router: vocab 6000 > denseMaxVocab 1024 -> prefix path")
    assert(plan.contains("token_dot"), "expected the prefix route's verify kernel")
    assert(!plan.contains("vec_dot"), "dense route must not fire on a Zipf vocabulary")
    val naive = Similarity.tokenCosinePairs(zipfDocs, "text", "doc_id",
      threshold = 0.8)
    assert(pairSet(routed) === pairSet(naive))
  }

  test("Zipf boilerplate trips the Jaccard skew guard; guarded result equals unguarded") {
    // the planted phrase gives one shingle a ~200-doc posting list
    val hottest = zipfDocs
      .select(col("doc_id"), explode(graft.functions.SketchExpressions
        .wordShingles(col("text"), 3)).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .agg(max("df")).head().getLong(0)
    info(s"hottest posting list: $hottest docs (cap 64) -> guard trips")
    assert(hottest > 64, s"fixture must contain a hot shingle, got $hottest")

    val guarded = Dedup.ngramJaccardPairs(zipfDocs, "text", "doc_id", n = 3,
      threshold = 0.6, maxPostingLen = 64L)
    assert(planOf(guarded).contains("sorted_intersect_size"),
      "tripped guard must route through the prefix filter's sorted-merge verify")
    val unguarded = Dedup.ngramJaccardPairs(zipfDocs, "text", "doc_id", n = 3,
      threshold = 0.6, maxPostingLen = 0L)
    assert(!planOf(unguarded).contains("sorted_intersect_size"))
    assert(pairSet(guarded) === pairSet(unguarded))
  }
}
