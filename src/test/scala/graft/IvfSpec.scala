package graft

import graft.operators.{Ivf, Similarity}
import graft.queries.VectorQueries

class IvfSpec extends SparkSuite {

  lazy val emb   = Tables(spark, sf("sf0.001"), "embeddings")
  lazy val model = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 3)

  test("training is deterministic and produces k centroids") {
    assert(model.k === 8)
    val again = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 3)
    assert(model.centroids.map(_.toSeq).toSeq === again.centroids.map(_.toSeq).toSeq)
  }

  test("probing all clusters equals brute force exactly") {
    val probe = VectorQueries.probe
    val viaIvf = Ivf.topK(emb, "embedding", "vec_id", model, probe, k = 10, nProbe = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val viaBrute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", probe, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(viaIvf === viaBrute)
  }

  test("restricted probes return valid, bounded results with decent recall") {
    val probe = VectorQueries.probe
    val brute = Similarity.bruteForceTopK(emb, "embedding", "vec_id", probe, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Ivf.topK(emb, "embedding", "vec_id", model, probe, k = 10, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ivf.size === 10)
    // half the space probed -> expect meaningful overlap with exact top-10
    assert((ivf intersect brute).size >= 3)
  }

  test("mat_vec assignment path agrees with the struct path at every k") {
    // withCluster switches formulation on k (struct chain for constant-k
    // serving models, one mat_vec kernel when k grows with the corpus) —
    // the two must assign IDENTICAL clusters or derived-k queries (q74)
    // silently diverge from the small-k-calibrated behavior.
    val wide = Ivf.train(emb, "embedding", "vec_id", k = 20, iters = 2)
    val base = emb.select(
      org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding"))
    val both = base
      .withColumn("a", Ivf.clusterOfStruct(
        org.apache.spark.sql.functions.col("embedding"), wide.centroids))
      .withColumn("b", Ivf.clusterOfMatVec(
        org.apache.spark.sql.functions.col("embedding"), wide.centroids))
    assert(both.where(org.apache.spark.sql.functions.col("a") =!=
      org.apache.spark.sql.functions.col("b")).count() === 0)
  }

  test("cluster-partitioned layout prunes partitions") {
    val path = java.nio.file.Files.createTempDirectory("ivf").toString + "/emb"
    Ivf.writeClustered(emb, "embedding", model, path)
    val probes = model.nearestClusters(VectorQueries.probe).take(2)
    val scan = spark.read.parquet(path)
      .where(org.apache.spark.sql.functions.col("cluster").isin(probes.map(Integer.valueOf): _*))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"))
    assert(scan.count() > 0)
  }
}
