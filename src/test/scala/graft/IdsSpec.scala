package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LogicalWindow}
import graft.operators.Ids

/** Distributed dense-rank surrogate ids (W2): same values as a global
  * `row_number` window, no single-partition sort of the frame.
  */
class IdsSpec extends SparkSuite {

  test("denseId equals global row_number over the same order") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (s"k${10000 - i}%05d".format(10000 - i), i))
      .toDF("k", "v").repartition(16)
    val got = Ids.denseId(df, "id", Seq(col("k")))
      .select("k", "id").as[(String, Long)].collect().toMap
    val want = df.withColumn("id", row_number().over(Window.orderBy("k")).cast("long"))
      .select("k", "id").as[(String, Long)].collect().toMap
    assert(got === want)
  }

  test("denseId ids are dense, contiguous, 1-based") {
    import spark.implicits._
    val df = (1 to 997).map(i => (i * 7 % 997, i)).toDF("k", "v").repartition(8)
    val ids = Ids.denseId(df, "id", Seq(col("k"))).select("id").as[Long]
      .collect().sorted
    assert(ids.toSeq === (1L to 997L))
  }

  test("denseId with multi-column order matches lexicographic rank") {
    import spark.implicits._
    val df = Seq((2, "b"), (1, "z"), (1, "a"), (2, "a"), (3, "m"))
      .toDF("g", "s").repartition(4)
    val got = Ids.denseId(df, "id", Seq(col("g"), col("s")))
      .orderBy("id").select("g", "s").as[(Int, String)].collect().toSeq
    assert(got === Seq((1, "a"), (1, "z"), (2, "a"), (2, "b"), (3, "m")))
  }

  test("denseId plan has no unpartitioned window over the input frame") {
    import spark.implicits._
    val df = (1 to 100).map(i => (s"k$i", i)).toDF("k", "v").repartition(8)
    val out = Ids.denseId(df, "id", Seq(col("k")))
    // The only global window allowed is the prefix-sum of per-partition
    // counts, which sits strictly above an Aggregate (≤ numPartitions rows).
    val offenders = out.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow if w.partitionSpec.isEmpty &&
        w.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(offenders.isEmpty)
  }
}
