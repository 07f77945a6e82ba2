package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters

class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  private def exactCounts = {
    val docs = Tables(spark, sf("sf0.001"), "documents").where(col("text").isNotNull)
    docs.select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
      .groupBy("tok").count().as[(String, Long)].collect().toMap
  }

  test("capacity >= vocabulary: Misra-Gries counts are exact") {
    val docs = Tables(spark, sf("sf0.001"), "documents").where(col("text").isNotNull)
    val mg = HeavyHitters.frequentTokens(docs, "text", k = 64, topN = 1000)
      .as[(String, Long)].collect().toMap
    assert(mg === exactCounts)
  }

  test("lossy regime: every estimate within the n/(k+1) bound, under-counts only") {
    val truth = exactCounts
    val n = truth.values.sum
    val k = 4
    val docs = Tables(spark, sf("sf0.001"), "documents").where(col("text").isNotNull)
    val mg = HeavyHitters.frequentTokens(docs, "text", k = k, topN = 1000)
      .as[(String, Long)].collect().toMap
    assert(mg.size <= k)
    mg.foreach { case (tok, est) =>
      val t = truth.getOrElse(tok, 0L)
      assert(est <= t, s"$tok over-counted: $est > $t")
      assert(est >= t - n / (k + 1), s"$tok outside MG bound")
    }
    // any token with frequency > n/(k+1) is guaranteed present
    truth.filter(_._2 > n / (k + 1)).keys.foreach { tok =>
      assert(mg.contains(tok), s"guaranteed heavy hitter $tok missing")
    }
  }

  test("merge is a valid MG summary regardless of partitioning") {
    // same data, very different partition layouts -> both exact at k>=vocab
    val toks = Tables(spark, sf("sf0.001"), "documents").where(col("text").isNotNull)
    Seq(1, 7).foreach { parts =>
      val mg = HeavyHitters.frequentTokens(toks.repartition(parts), "text", 64, 1000)
        .as[(String, Long)].collect().toMap
      assert(mg === exactCounts, s"parts=$parts")
    }
  }
}
