package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.queries.VectorQueries

/** The ANN scale path: LSH bucket as a physical partition column ->
  * partition-pruned probes.
  */
class PartitionedAnnSpec extends SparkSuite {

  test("bucket-partitioned ANN prunes partitions and matches in-memory LSH recall") {
    val path = Files.createTempDirectory("ann").toString + "/emb"
    val emb  = Tables(spark, sf("sf0.001"), "embeddings")
    Similarity.writeBucketed(emb, "embedding", "vec_id", path, nBits = 4)

    val probe = VectorQueries.probe
    val viaPartitions = Similarity.lshTopKPartitioned(
      spark, path, "embedding", "vec_id", probe, k = 10, nBits = 4)

    // Partition pruning is visible in the scan: bucket filter listed as a
    // partition filter, not a data filter.
    val plan = viaPartitions.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"))

    // Same result as the in-memory bucket filter over the same nBits.
    val viaMemory = Similarity.lshTopK(emb, "embedding", "vec_id", probe,
      k = 10, nBits = 4)
    val a = viaPartitions.select("vec_id").collect().map(_.getLong(0)).toSeq
    val b = viaMemory.select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(a === b)
  }
}
