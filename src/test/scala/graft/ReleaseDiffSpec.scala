package graft

import org.apache.spark.sql.functions._
import graft.corpus.{ReleaseDiff, ReleasePipeline}

/** Acquisition triage ([[ReleaseDiff]]): verdict semantics on a
  * hand-computed micro-corpus, internal consistency on the fixture
  * (q88's oracle covers the exact route's values end-to-end), and the
  * signature-registry route's agreement contract with the exact route.
  */
class ReleaseDiffSpec extends SparkSuite {
  import spark.implicits._

  private val relText =
    "the quick brown fox jumps over a lazy dog near the river bank today"
  private val release = Seq(
    (1L, relText),
    (2L, "completely different reference material about ships and harbors at dawn")
  ).toDF("doc_id", "text")

  test("verdicts on a hand-computed micro-corpus") {
    val candidates = Seq(
      // raw-identical to release doc 1 -> exact
      (10L, relText),
      // punctuation variant: normalized-equal, shingle-divergent -> exact
      // (with best_jaccard pinned at 1.0 by the verdict, not the shingles)
      (11L, "the, quick! brown? fox; jumps: over a lazy dog near the river bank today"),
      // shares a long run of shingles with doc 1 but differs -> near
      (12L, "the quick brown fox jumps over a lazy dog near the river bank yesterday"),
      // nothing in common -> novel
      (13L, "entirely unrelated musings on compilers and garbage collection")
    ).toDF("doc_id", "text")
    val got = ReleaseDiff.classify(candidates, release, "text", "doc_id",
        n = 3, threshold = 0.5)
      .orderBy("doc_id")
      .as[(Long, String, Option[Double])].collect()
    assert(got.map(r => r._1 -> r._2).toMap ===
      Map(10L -> "exact", 11L -> "exact", 12L -> "near", 13L -> "novel"))
    assert(got.filter(_._2 == "exact").forall(_._3.contains(1.0)))
    // doc 12: 12 shingles each, 11 shared -> J = 11/13
    val near = got.find(_._1 == 12L).get._3.get
    assert(math.abs(near - 11.0 / 13.0) < 1e-9)
    assert(got.find(_._1 == 13L).get._3.isEmpty)
  }

  test("edit leg: typo-level short-string dups upgrade novel -> near; long docs are exempt") {
    val rel = Seq(
      (1L, "Spark Catalyst"),
      (2L, "a very long document body " * 4 + "with plenty of shingles to share")
    ).toDF("doc_id", "text")
    val cand = Seq(
      // one substitution off a release title: every word shingle differs
      // (2-word strings shingle whole), so the Jaccard leg says novel —
      // the edit leg must upgrade
      (10L, "Spork Catalyst"),
      // identical short string -> exact, and best_edit_dist reports 0
      (11L, "Spark Catalyst"),
      // near the LONG release doc via shingles; too long for the edit leg
      (12L, "a very long document body " * 4 + "with plenty of shingles to spare"),
      // nothing like anything
      (13L, "quantum chromodynamics")
    ).toDF("doc_id", "text")
    val got = ReleaseDiff.classifyWithEdits(cand, rel, "text", "doc_id",
        n = 3, threshold = 0.5, editTau = 2, editMaxLen = 20)
      .orderBy("doc_id")
      .as[(Long, String, Option[Double], Option[Long])].collect()
    val verdicts = got.map(r => r._1 -> r._2).toMap
    assert(verdicts === Map(10L -> "near", 11L -> "exact", 12L -> "near", 13L -> "novel"))
    val edits = got.map(r => r._1 -> r._4).toMap
    assert(edits(10L) === Some(1L))   // the upgrade's evidence
    assert(edits(11L) === Some(0L))
    assert(edits(12L) === None)       // exceeds editMaxLen -> leg skipped
    assert(edits(13L) === None)
    // the upgraded doc carries no jaccard (the jaccard leg did not fire)
    assert(got.find(_._1 == 10L).get._3.isEmpty)
  }

  test("fixture run: one verdict per candidate, values internally consistent") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val cand = docs.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val out = ReleaseDiff.classify(cand,
      docs.where(pmod(col("doc_id"), lit(7)) === 0), "text", "doc_id",
      n = 3, threshold = 0.5)
    assert(out.count() === cand.where(col("text").isNotNull).count())
    assert(out.groupBy("doc_id").count().where(col("count") > 1).isEmpty)
    assert(out.where(col("verdict") === "exact" &&
      col("best_jaccard") =!= 1.0).isEmpty)
    assert(out.where(col("verdict") === "near" &&
      (col("best_jaccard") < 0.5 || col("best_jaccard") > 1.0)).isEmpty)
    assert(out.where(col("verdict") === "novel" &&
      col("best_jaccard").isNotNull).isEmpty)
  }

  test("registry route: certain on raw-identical dups, est-based elsewhere, release text untouched") {
    val registry = ReleasePipeline.registryOf(release, "text", "doc_id", 3)
    val candidates = Seq(
      (10L, relText),
      (13L, "entirely unrelated musings on compilers and garbage collection")
    ).toDF("doc_id", "text")
    val got = ReleaseDiff.classifyViaRegistry(candidates, registry,
        "text", "doc_id", threshold = 0.5)
      .orderBy("doc_id").as[(Long, String, Option[Double])].collect()
    // identical text -> identical signature -> every band collides ->
    // est 1.0 -> 'exact', with certainty (no banding recall caveat)
    assert(got.toSeq.map(r => r._1 -> r._2) ===
      Seq(10L -> "exact", 13L -> "novel"))
  }

  test("registry route recall contract on the fixture: near+exact is a subset of the exact route's") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val cand = docs.where(pmod(col("doc_id"), lit(7)) =!= 0)
    val rel = docs.where(pmod(col("doc_id"), lit(7)) === 0)
    val exactRoute = ReleaseDiff.classify(cand, rel, "text", "doc_id",
      n = 3, threshold = 0.5)
    val regRoute = ReleaseDiff.classifyViaRegistry(cand,
      ReleasePipeline.registryOf(rel, "text", "doc_id", 3),
      "text", "doc_id", threshold = 0.5)
    // The est threshold can pass a pair whose true J sits just under the
    // cut and banding can miss marginal pairs, so the routes need not
    // agree doc by doc. What IS a contract: a doc the registry route
    // flags at est >= 0.75 (threshold + the LSH family's documented 0.25
    // slack) has true J >= 0.5 with near-certainty on 64 hashes -> it
    // must be flagged by the complete exact route too.
    val confident = regRoute.where(col("verdict") =!= "novel" &&
      col("best_jaccard") >= 0.75).select("doc_id")
    val flaggedExact = exactRoute.where(col("verdict") =!= "novel")
      .select("doc_id")
    assert(confident.join(flaggedExact, Seq("doc_id"), "left_anti").isEmpty)
  }
}
