package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Edge semantics of the containment-dedup and sparse token-cosine
  * operators (value-level parity with SQL is the DuckDB oracle's job —
  * q61/q62).
  */
class ContainmentCosineSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),        // superset doc
    (2L, "alpha beta gamma delta"),                     // contained in 1
    (3L, "beta gamma delta epsilon"),                   // contained in 1
    (4L, "omega psi chi phi"),                          // unrelated
    (5L, "alpha beta gamma delta"),                     // equal to 2 (mutual)
    (6L, "")                                            // empty -> excluded
  ).toDF("doc_id", "text")

  test("containment: subset docs point at their superset, directed") {
    val pairs = Dedup.containmentPairs(
        docs.where(length(trim(col("text"))) > 0), "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 1L)) && pairs.contains((3L, 1L)))
    assert(!pairs.contains((1L, 2L)))          // superset is NOT contained
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containment: equal shingle sets emit both directions") {
    val pairs = Dedup.containmentPairs(
        docs.where(length(trim(col("text"))) > 0), "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 5L)) && pairs.contains((5L, 2L)))
  }

  test("containment: rarest-shingle index equals the full posting self-join") {
    // the production operator (one index row per doc) vs the naive
    // formulation — identical directed pairs on both the synthetic corpus
    // and the fixture (mutual containment, subsets, unrelated docs)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "n_common").as[(Long, Long, Long)].collect().toSet
    val fixture = docs.where(length(trim(col("text"))) > 0)
    assert(pairs(Dedup.containmentPairs(fixture, "text", "doc_id")) ===
      pairs(Dedup.containmentPairsIndexJoin(fixture, "text", "doc_id")))
    val corpus = Tables(spark, sf("sf0.001"), "documents")
      .where(length(trim(col("text"))) > 0)
    assert(pairs(Dedup.containmentPairs(corpus, "text", "doc_id")) ===
      pairs(Dedup.containmentPairsIndexJoin(corpus, "text", "doc_id")))
  }

  test("token cosine: identical docs score 1.0, disjoint docs absent") {
    val pairs = Similarity.tokenCosinePairs(docs, "text", "doc_id", threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(math.abs(pairs((2L, 5L)) - 1.0) < 1e-12)
    assert(!pairs.contains((1L, 4L)))          // no shared token, no pair
    // cosine(1,2): dot=4, |1|=sqrt(6), |2|=2 -> 4/(2*sqrt(6))
    assert(math.abs(pairs((1L, 2L)) - 4.0 / (2.0 * math.sqrt(6.0))) < 1e-12)
  }

  test("token cosine: dense AND prefix routes equal the naive exact join") {
    // The corpus's 31-token vocabulary dense-routes by default; forcing
    // denseMaxVocab = 0 exercises the prefix-index route. Both must equal
    // the naive posting join — routing is a physical choice only.
    val corpus = Tables(spark, sf("sf0.001"), "documents")
    Seq(0.5, 0.8, 0.95).foreach { t =>
      val naive = Similarity.tokenCosinePairs(corpus, "text", "doc_id", t)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 9).as("c"))
        .as[(Long, Long, Double)].collect().toSet
      val dense = Similarity.tokenCosinePairsPrefix(corpus, "text", "doc_id", t)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 9).as("c"))
        .as[(Long, Long, Double)].collect().toSet
      val prefix = Similarity.tokenCosinePairsPrefix(corpus, "text", "doc_id", t,
          denseMaxVocab = 0)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 9).as("c"))
        .as[(Long, Long, Double)].collect().toSet
      assert(dense === naive, s"dense route, threshold $t")
      assert(prefix === naive, s"prefix route, threshold $t")
    }
  }

  test("token cosine: df-capped index keeps norms exact, drops hot-token dots") {
    // 'alpha' appears in docs 1,2,5 (df=3); cap at 2 removes it from the
    // INDEX (candidate dots) but norms still count it.
    val exact = Similarity.tokenCosinePairs(docs, "text", "doc_id", 0.0)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    val capped = Similarity.tokenCosinePairs(docs, "text", "doc_id", 0.0, maxTokenDf = 2)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    // capped cosine <= exact cosine for every surviving pair
    capped.foreach { case (k, v) => assert(v <= exact(k) + 1e-12) }
    // (2,5) shares ONLY hot tokens (alpha/beta/gamma/delta, df >= 3):
    // the capped index generates no candidate for it at all.
    assert(!capped.contains((2L, 5L)))
    // (1,3) keeps its rare shared token epsilon (df=2): dot=1,
    // norms stay exact -> 1/(sqrt(6)*2).
    assert(math.abs(capped((1L, 3L)) - 1.0 / (math.sqrt(6.0) * 2.0)) < 1e-12)
  }

  test("blocked exact cosine: maxRows guard refuses oversized input, 0 disables it") {
    val vecs = (0 until 10).map(i => (i.toLong, Array.fill(4)(i.toFloat + 1f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineDupPairsExactBlocked(vecs, "embedding", "vec_id",
        0.9, blocks = 2, maxRows = 5)
    }
    assert(e.getMessage.contains("maxRows=5"))
    // maxRows = 0 skips the probe; identical content all-pairs still works
    assert(Similarity.cosineDupPairsExactBlocked(vecs, "embedding", "vec_id",
      0.99, blocks = 2, maxRows = 0).count() === 45L)  // all colinear pairs
  }
}
