package graft

import org.apache.spark.sql.functions._
import graft.corpus.CorpusPipeline
import graft.functions.TextFns
import graft.operators.Dedup

class CorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("connected components groups chained pairs into one cluster") {
    // chain 1~2, 2~3 plus isolated pair 10~11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L)
    assert(cc(10L) === 10L && cc(11L) === 10L)
    // distributed label-propagation fallback must agree
    val dist = Dedup.connectedComponentsDistributed(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === cc)
  }

  test("corpus pipeline: monotonic reductions, no surviving exact dups") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val res = CorpusPipeline.run(docs, CorpusPipeline.Config(
      minTokens = 3, minQuality = 0.1, nearDupThreshold = 0.9))
    val s = res.stats
    assert(s.input >= s.afterQuality)
    assert(s.afterQuality >= s.afterExactDedup)
    assert(s.afterExactDedup >= s.afterNearDedup)
    assert(s.afterNearDedup > 0)
    // exact-dup freedom: every normalized fingerprint appears once
    val fpDups = res.corpus
      .groupBy(TextFns.fingerprint(col("text"))).count()
      .where(col("count") > 1).count()
    assert(fpDups === 0)
  }
}
