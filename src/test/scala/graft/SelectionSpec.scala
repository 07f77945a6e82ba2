package graft

import org.apache.spark.sql.functions._
import graft.operators.{LmScore, Selection}

/** DSIR-style targeted selection ([[Selection]]): the merged-model
  * weight pass against the two-scoring definition, Gumbel-top-k
  * determinism and its limiting behaviors.
  */
class SelectionSpec extends SparkSuite {
  import spark.implicits._

  test("dsirWeights equals the two-pass scoreDocs difference") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val target = docs.where(pmod(col("doc_id"), lit(97)) === 0)
    val corpus = docs.where(pmod(col("doc_id"), lit(97)) =!= 0)
    val tLm = LmScore.trainUnigram(target, "text")
    val rLm = LmScore.trainUnigram(corpus, "text")
    val oneScan = Selection.dsirWeights(corpus, "text", "doc_id", tLm, rLm,
        oovLogp = -12.0)
      .select(col("id"), col("weight"), col("n_tokens"))
    val twoScans = LmScore.scoreDocs(corpus, "text", "doc_id", tLm, -12.0)
      .select(col("id"), col("mean_logp").as("wt"))
      .join(LmScore.scoreDocs(corpus, "text", "doc_id", rLm, -12.0)
        .select(col("id"), col("mean_logp").as("wr"), col("n_tokens")), "id")
      .select(col("id"), (col("wt") - col("wr")).as("weight"), col("n_tokens"))
    val joined = oneScan.as("a").join(twoScans.as("b"), Seq("id"))
    assert(joined.count() === oneScan.count())
    // identical token stream, identical floors — only summation order
    // differs (mean of diffs vs diff of means), so agreement is to fp
    // tolerance, not bit-exact
    assert(joined.where(abs(col("a.weight") - col("b.weight")) > 1e-9 ||
      col("a.n_tokens") =!= col("b.n_tokens")).isEmpty)
  }

  test("resampleTopK: deterministic, id-seeded, exhaustive at k >= n") {
    val w = Seq((1L, 0.0), (2L, 0.1), (3L, -0.2), (4L, 0.4), (5L, 0.05))
      .toDF("id", "weight")
    val a = Selection.resampleTopK(w, "id", "weight", k = 3, seed = 7L)
      .select("id").as[Long].collect().toSet
    val b = Selection.resampleTopK(w, "id", "weight", k = 3, seed = 7L)
      .select("id").as[Long].collect().toSet
    assert(a === b && a.size === 3)
    assert(Selection.resampleTopK(w, "id", "weight", k = 99, seed = 7L)
      .count() === 5)
    // a different seed re-draws the noise — over 32 seeds the union of
    // draws must exceed any single draw (pure determinism in the seed
    // would otherwise be untested)
    val union = (1 to 32).flatMap(s =>
      Selection.resampleTopK(w, "id", "weight", k = 2, seed = s.toLong)
        .select("id").as[Long].collect()).toSet
    assert(union.size > 2)
  }

  test("temperature -> 0 degenerates to deterministic top-k by weight") {
    val w = (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "weight")
    val got = Selection.resampleTopK(w, "id", "weight", k = 3, seed = 1L,
        temperature = 1e-9)
      .select("id").as[Long].collect().toSet
    assert(got === Set(8L, 9L, 10L))
  }

  test("importance property: a strongly up-weighted doc is always drawn") {
    // weight 50 vs 0: odds e^50 -- across 16 seeds the heavy doc must
    // appear in every k=1 draw (P(miss once) ~ n * e^-50)
    val w = (1L to 20L).map(i => (i, if (i == 13L) 50.0 else 0.0))
      .toDF("id", "weight")
    (1 to 16).foreach { s =>
      val got = Selection.resampleTopK(w, "id", "weight", k = 1, seed = s.toLong)
        .select("id").as[Long].head()
      assert(got === 13L, s"seed $s drew $got")
    }
  }
}
