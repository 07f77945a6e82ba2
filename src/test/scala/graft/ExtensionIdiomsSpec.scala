package graft

import org.apache.spark.sql.functions._
import graft.functions.GroupSample

/** SURVEY §2.11 extension idioms: typed Aggregator + Generator UDTF. */
class ExtensionIdiomsSpec extends SparkSuite {
  import spark.implicits._

  test("GroupSample: deterministic, bounded per group, stable across runs") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val a = GroupSample.sampleKPerGroup(docs, "lang", "doc_id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val b = GroupSample.sampleKPerGroup(docs, "lang", "doc_id", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(a === b)
    assert(a.groupBy(_._1).forall(_._2.length <= 5))
  }

  test("ngram_tuples works via LATERAL VIEW SQL") {
    Tables(spark, sf("sf0.001"), "documents").createOrReplaceTempView("docs_v")
    val r = spark.sql(
      """SELECT doc_id, pos, ngram FROM docs_v
        | LATERAL VIEW ngram_tuples(text, 2) t AS pos, ngram
        | WHERE doc_id = 0 ORDER BY pos LIMIT 2""".stripMargin).collect()
    assert(r.length === 2)
    assert(r(0).getInt(1) === 0 && r(1).getInt(1) === 1)
    // adjacent 2-grams overlap by one word
    assert(r(0).getString(2).split(" ").last === r(1).getString(2).split(" ").head)
  }

  test("ngram_tuples: empty/short docs degrade gracefully") {
    val out = Seq((1L, "one two"), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select($"id", expr("ngram_tuples(text, 3)"))
      .collect()
    assert(out.length === 1)            // only doc 1 yields a (single) ngram
    assert(out(0).getString(2) === "one two")
  }
}
