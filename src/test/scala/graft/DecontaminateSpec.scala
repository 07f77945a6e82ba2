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

  test("benchmark side broadcasts (the corpus is never shuffled for the probe)") {
    val plan = Decontaminate.contaminationHits(corpus, "text", "doc_id",
      benchmark, "text", n = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
