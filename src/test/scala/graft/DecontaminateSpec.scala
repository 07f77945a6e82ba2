package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),   // contains benchmark 3-gram
    (2L, "entirely novel training content here"),           // clean
    (3L, "quick brown fox appears again in this doc"),      // contains it too
    (4L, "")                                                // blank -> never flagged
  ).toDF("doc_id", "text")

  private val benchmark = Seq(
    (100L, "benchmark asks about the quick brown fox riddle")
  ).toDF("bench_id", "text")

  test("contaminationHits flags exactly the overlapping docs with distinct-gram counts") {
    val hits = Decontaminate.contaminationHits(corpus, "text", "doc_id",
        benchmark, "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(hits.keySet === Set(1L, 3L))
    // doc 1 shares "the quick brown" and "quick brown fox"; doc 3 only the latter
    assert(hits(1L) === 2L)
    assert(hits(3L) === 1L)
  }

  test("clean removes contaminated rows and passes everything else through unchanged") {
    val cleaned = Decontaminate.clean(corpus, "text", "doc_id", benchmark, "text", n = 3)
    assert(cleaned.select("doc_id").as[Long].collect().toSet === Set(2L, 4L))
    assert(cleaned.columns.toSeq === corpus.columns.toSeq)
  }

  test("noveltyScore: full-overlap docs score 0, unseen-vocab docs score 1; routes agree") {
    val reference = Seq((50L, "the quick brown fox jumps over the lazy dog"))
      .toDF("ref_id", "text")
    val cands = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // every gram known
      (2L, "entirely novel training content written here"), // nothing known
      (3L, "the quick brown fox discovers novel content")   // mixed
    ).toDF("doc_id", "text")
    def run(bcast: Boolean) = Decontaminate.noveltyScore(
        cands, "text", "doc_id", reference, "text", n = 3,
        broadcastReference = bcast)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val b = run(bcast = true)
    assert(b(1L)._3 === 0.0)                         // fully redundant
    assert(b(2L)._3 === 1.0 && b(2L)._2 === 0L)      // fully novel
    assert(b(3L)._3 > 0.0 && b(3L)._3 < 1.0)         // partial
    assert(b(3L)._1 > b(3L)._2)
    // the shuffled-reference route (reference too big to ship) agrees
    assert(run(bcast = false) === b)
  }

  test("benchmark side broadcasts (the corpus is never shuffled for the probe)") {
    val plan = Decontaminate.contaminationHits(corpus, "text", "doc_id",
      benchmark, "text", n = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("byRetrieval: reworded leakage surfaces, hit rollup + argmax ties high, floor filters") {
    val cand = Seq(
      (1L, "alpha beta gamma delta shared"),   // rewording of item 10
      (2L, "unrelated text about nothing"),
      (3L, "alpha beta gamma delta shared"))   // identical twin of 1
      .toDF("doc_id", "text")
    val bench = Seq(
      (10L, "shared delta gamma beta alpha"),  // word-permuted: zero 3-gram overlap
      (11L, "alpha beta gamma delta shared"))  // exact item
      .toDF("doc_id", "text")
    // the exact n-gram route misses the permutation entirely
    assert(Decontaminate.contaminationHits(
      Seq((1L, "alpha beta gamma delta shared")).toDF("doc_id", "text"),
      "text", "doc_id",
      bench.where(col("doc_id") === 10L), "text", n = 3).count() === 0L)
    val got = Decontaminate.byRetrieval(cand, "text", "doc_id",
        bench, "text", "doc_id", k = 5, minScore = 0.1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // docs 1 and 3 hit BOTH items (same terms), doc 2 shares no term
    assert(got.keySet === Set(1L, 3L))
    assert(got(1L)._1 === 2L && got(3L)._1 === 2L)
    // identical docs score identically against both items; the argmax
    // breaks the item tie HIGH (11 > 10)
    assert(got(1L)._3 === 11L && got(3L)._3 === 11L)
    assert(got(1L)._2 === got(3L)._2 && got(1L)._2 > 0.0)
    // a floor above every score empties the report
    assert(Decontaminate.byRetrieval(cand, "text", "doc_id",
      bench, "text", "doc_id", k = 5, minScore = 1e9).count() === 0L)
  }

  test("bloomContaminationHits == contaminationHits (no false negatives, FPs verified away)") {
    val exact = Decontaminate.contaminationHits(corpus, "text", "doc_id",
      benchmark, "text", n = 3).as[(Long, Long)].collect().toMap
    val bloom = Decontaminate.bloomContaminationHits(corpus, "text", "doc_id",
      benchmark, "text", n = 3).as[(Long, Long)].collect().toMap
    assert(bloom === exact)
  }

  test("bloom route stays exact even when the sketch is saturated (every probe a maybe)") {
    // 1 expected item / 50% fpp for dozens of grams → near-every corpus
    // gram survives the prefilter; the verify join must still produce
    // the exact answer
    val exact = Decontaminate.contaminationHits(corpus, "text", "doc_id",
      benchmark, "text", n = 3).as[(Long, Long)].collect().toMap
    val dense = Decontaminate.bloomContaminationHits(corpus, "text", "doc_id",
      benchmark, "text", n = 3, expectedGrams = 1L, fpp = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(dense === exact)
  }

  test("bloom route: empty benchmark yields the empty (id, n_hits) frame") {
    val out = Decontaminate.bloomContaminationHits(corpus, "text", "doc_id",
      benchmark.where(lit(false)), "text", n = 3)
    assert(out.columns.toSeq === Seq("id", "n_hits"))
    assert(out.count() === 0L)
    // blank-only benchmark (no grams) behaves the same
    assert(Decontaminate.bloomContaminationHits(corpus, "text", "doc_id",
      Seq((1L, "   ")).toDF("bench_id", "text"), "text", n = 3).count() === 0L)
  }

  test("bloom route rejects nonsensical sizing") {
    intercept[IllegalArgumentException] {
      Decontaminate.bloomContaminationHits(corpus, "text", "doc_id",
        benchmark, "text", expectedGrams = 0L)
    }
    intercept[IllegalArgumentException] {
      Decontaminate.bloomContaminationHits(corpus, "text", "doc_id",
        benchmark, "text", fpp = 1.0)
    }
  }

  test("bloom prefilter is map-side: the probe sits in the corpus scan stage, before any exchange") {
    val plan = Decontaminate.bloomContaminationHits(corpus, "text", "doc_id",
        benchmark, "text", n = 3)
      .queryExecution.executedPlan.toString
    // the probe is a Filter on might_contain (the expression's own
    // prettyName) over the exploded corpus grams — assert it exists and
    // no nested-loop join appeared to ship the sketch (it is inlined as
    // a literal)
    assert(plan.contains("might_contain"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}
