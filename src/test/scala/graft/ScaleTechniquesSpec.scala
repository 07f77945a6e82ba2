package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale techniques: skew salting and bucketed co-located joins. */
class ScaleTechniquesSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join on skewed data (inner + left)") {
    // 10k fact rows, 90% on one hot key
    val fact = spark.range(10000)
      .select($"id", when($"id" % 10 === 0, $"id" % 5).otherwise(0L).as("k"))
    val dim = Seq((0L, "hot"), (1L, "a"), (2L, "b"), (9L, "unmatched"))
      .toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val plain  = fact.join(dim, Seq("k"), jt)
        .groupBy("k").agg(count(lit(1)).as("n"), count("name").as("matched"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val salted = Skew.saltedJoin(fact, dim, "k", saltCol = "id", joinType = jt)
        .groupBy("k").agg(count(lit(1)).as("n"), count("name").as("matched"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(salted === plain, s"join type $jt")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val orders   = Tables(spark, sf("sf0.001"), "orders")
    val customer = Tables(spark, sf("sf0.001"), "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // The in-memory catalog forgets tables across JVMs but the warehouse
    // directories persist — remove stale locations.
    val wh = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), "graft-warehouse")
    for (t <- Seq("b_orders", "b_customer")) {
      val d = wh.resolve(t)
      if (java.nio.file.Files.exists(d)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
        .groupBy("c_mktsegment").count()
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      // the join itself must not re-shuffle its bucketed inputs
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning(o_custkey"),
        s"unexpected shuffle of bucketed side:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("LSH bucket cap drops mega-buckets but keeps ordinary near-dup pairs") {
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    // 30 near-identical docs (a mega-cluster) + one ordinary near-dup pair
    val mega = (1L to 30L).map(i => (i, base + s" v$i"))
    val pairDocs = Seq(
      (100L, "completely different content about catalyst optimizer rules " * 8 + "x"),
      (101L, "completely different content about catalyst optimizer rules " * 8 + "y"))
    val docs = (mega ++ pairDocs).toDF("doc_id", "text")

    val uncapped = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 64, 16, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((100L, 101L)))
    assert(uncapped.count { case (a, b) => a <= 30 && b <= 30 } > 100)

    val capped = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 64, 16, 0.5,
      maxBucketSize = 10)
    assert(capped.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      === Set((100L, 101L)))

    // cap off -> bit-identical to the uncapped default path
    val explicit = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 64, 16, 0.5,
      maxBucketSize = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(explicit === uncapped)
  }
}
