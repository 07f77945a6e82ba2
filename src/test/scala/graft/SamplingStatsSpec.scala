package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextStats}

class SamplingStatsSpec extends SparkSuite {
  import spark.implicits._

  test("hexThreshold is the base-16 expansion of the fraction") {
    assert(Sampling.hexThreshold(0.25) === "4" + "0" * 31)
    assert(Sampling.hexThreshold(0.5)  === "8" + "0" * 31)
    assert(Sampling.hexThreshold(0.2)  === "3" * 32)
    assert(Sampling.hexThreshold(1.0)  === "f" * 32)   // floor-capped at 15
    assert(Sampling.hexThreshold(0.0)  === "0" * 32)
  }

  test("hash sample is deterministic and partition-layout independent") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.byHash(df, "id", 0.25).select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.byHash(df.repartition(13), "id", 0.25)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // within 5% of the target fraction on 10k uniform keys
    assert(math.abs(a.length / 10000.0 - 0.25) < 0.05)
  }

  test("hash sample decisions are append-stable (growing corpus)") {
    val small = Sampling.byHash(spark.range(1000).toDF("id"), "id", 0.25)
      .select("id").as[Long].collect().toSet
    val large = Sampling.byHash(spark.range(10000).toDF("id"), "id", 0.25)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(large))
    assert(large.filter(_ < 1000) === small)
  }

  test("stratified mixing: per-stratum fractions honored, defaults drop unknowns") {
    val df = spark.range(30000)
      .select(col("id"), element_at(array(lit("web"), lit("books"), lit("logs")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("src"))
    val mixed = Sampling.stratifiedByHash(df, "src", "id",
      Map("web" -> 0.3, "books" -> 1.0))   // logs absent -> default 0 -> dropped
    val counts = mixed.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("logs"))
    assert(counts("books") === 10000L)                         // keep-all stratum
    assert(math.abs(counts("web") / 10000.0 - 0.3) < 0.05)
    // per-stratum decisions match the single-stratum operator exactly
    val webOnly = Sampling.byHash(df.where(col("src") === "web"), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(mixed.where(col("src") === "web").select("id").as[Long].collect().toSet === webOnly)
    // defaultFraction applies to strata without an explicit weight
    val withDefault = Sampling.stratifiedByHash(df, "src", "id",
      Map("books" -> 1.0), defaultFraction = 0.5)
    val dcounts = withDefault.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(math.abs(dcounts("logs") / 10000.0 - 0.5) < 0.05)
    assert(math.abs(dcounts("web") / 10000.0 - 0.5) < 0.05)
  }

  test("token-budget sampling equals the defining per-stratum window cumsum") {
    // 400 docs across 3 strata with varied lengths; the bucketed
    // operator must keep EXACTLY the rows the naive global-window
    // formulation keeps (same hash order, same inclusive-prefix rule).
    val docs = (1L to 400L).map { i =>
      (i, Seq("web", "code", "books")(((i * 7) % 3).toInt), 1L + (i * 13) % 50)
    }.toDF("doc_id", "src", "len")
    val budgets = Map("web" -> 900L, "code" -> 0L)
    val got = Sampling.byTokenBudget(docs, "src", "doc_id", "len",
        budgets, defaultBudget = 300L)
      .select("doc_id").as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val budget = when(col("src") === "web", 900L)
      .when(col("src") === "code", 0L).otherwise(300L)
    val want = docs.withColumn("cum", sum("len").over(w))
      .where(col("cum") <= budget)
      .select("doc_id").as[Long].collect().toSet
    assert(got === want && got.nonEmpty)
    // zero budget drops the whole stratum; huge budget keeps it entirely
    assert(!docs.where(col("src") === "code").select("doc_id").as[Long]
      .collect().exists(got))
    val all = Sampling.byTokenBudget(docs, "src", "doc_id", "len",
      Map.empty, defaultBudget = Long.MaxValue / 4)
    assert(all.count() === 400L)
  }

  test("token-budget sampling: NULL stratum gets the default budget, not silently dropped") {
    val docs = Seq(
      (1L, null.asInstanceOf[String], 40L), (2L, null.asInstanceOf[String], 40L),
      (3L, null.asInstanceOf[String], 40L), (4L, "web", 10L))
      .toDF("doc_id", "src", "len")
    val kept = Sampling.byTokenBudget(docs, "src", "doc_id", "len",
        Map("web" -> 100L), defaultBudget = 80L)
      .select("doc_id").as[Long].collect().toSet
    // null stratum: hash order over {1,2,3}, 40 tokens each, budget 80
    // -> exactly two survive; web row fits its own budget.
    assert(kept.contains(4L) && (kept - 4L).size === 2)
  }

  test("token-budget sampling: refuses input columns in the reserved __tb_ namespace") {
    val docs = Seq((1L, "web", 10L, "x")).toDF("doc_id", "src", "len", "__tb_h")
    val e = intercept[IllegalArgumentException] {
      Sampling.byTokenBudget(docs, "src", "doc_id", "len", Map("web" -> 100L))
    }
    assert(e.getMessage.contains("__tb_"))
  }

  test("top-k by score: NULL and NaN scores are excluded, never crash the job") {
    import graft.functions.GroupSample
    val rows = Seq(
      (1L, "a", Some(5.0)), (2L, "a", Some(Double.NaN)), (3L, "a", None),
      (4L, "a", Some(7.0)), (5L, "a", Some(3.0)))
      .toDF("id", "grp", "score")
    val got = GroupSample.topKPerGroupByScore(rows, "grp", "id", "score", k = 2)
      .select("id").as[Long].collect().toSet
    assert(got === Set(4L, 1L))  // 7.0 and 5.0; NaN/NULL excluded
  }

  test("top-k by score per group equals the window rank; ties break to smaller id") {
    import graft.functions.GroupSample
    val rows = (1L to 300L).map(i =>
      (i, Seq("a", "b", "c")((i % 3).toInt), (i * 17 % 23).toDouble))
      .toDF("id", "grp", "score")
    val got = GroupSample.topKPerGroupByScore(rows, "grp", "id", "score", k = 5)
      .select("grp", "id").as[(String, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("grp")
      .orderBy(col("score").desc, col("id"))
    val want = rows.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(got === want && got.size === 15)
    // k larger than any group returns everything
    assert(GroupSample.topKPerGroupByScore(rows, "grp", "id", "score", 1000)
      .count() === 300L)
  }

  test("top-ngram fraction: repeated phrase dominates; short docs degenerate to 1.0") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"),              // bigram "spam spam" x4
      (2L, "one two three four five"),               // all bigrams unique
      (3L, "hi")                                      // <= n words -> whole text
    ).toDF("doc_id", "text")
    val out = TextStats.topNgramFraction(docs, "text", "doc_id", n = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((4L, 1.0)))                  // 4 identical bigrams
    assert(out(2L)._1 === 4L && math.abs(out(2L)._2 - 0.25) < 1e-12)
    assert(out(3L) === ((1L, 1.0)))
  }
}
