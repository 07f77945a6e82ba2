package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** IVF (inverted-file) ANN: a coarse k-means quantizer partitions the
  * embedding space; probes scan only the `nProbe` nearest clusters.
  *
  * Everything is DataFrame-native and deterministic:
  *   - init = vectors of the k smallest ids (seedless, reproducible),
  *   - Lloyd iterations: assignment is an argmin over k codegen'd
  *     `vec_dot` distances (one scan), centroid update is a posexplode +
  *     groupBy(cluster, dim) mean (one shuffle of #rows x dim SMALL longs),
  *     centroids collected to the driver each round (k x dim doubles —
  *     metadata-sized at any data scale),
  *   - like the LSH sign-bucket, the cluster id is computable at write time
  *     and serves as a partition column for partition-pruned probes.
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
    /** Distances from a query to every centroid, nearest-first. */
    def nearestClusters(q: Seq[Double]): Seq[Int] =
      centroids.zipWithIndex.map { case (c, i) =>
        val d = c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, i)
      }.sortBy(t => (t._1, t._2)).map(_._2).toSeq
  }

  private def q(n: String): Column = col(s"`$n`")

  /** Squared-L2 argmin assignment over literal centroids.
    * dist_j = |v|^2 - 2 v.c_j + |c_j|^2; |v|^2 is constant per row, so the
    * argmin needs only -2 v.c_j + |c_j|^2. Ties break to the lower cluster
    * id (struct ordering). Small-k formulation: one struct per centroid,
    * k codegen'd `vec_dot` nodes — fine while k is a constant (q56/q59's
    * k=16); spec-agreed with the mat_vec path below.
    */
  private[graft] def clusterOfStruct(vecCol: Column,
                                     centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, j) =>
      val cNorm2 = c.map(x => x * x).sum
      struct(
        (VectorFns.dot(vecCol, VectorFns.vecLit(c.toSeq)) * -2.0d + cNorm2).as("d"),
        lit(j).as("j"))
    }
    array_min(array(scored: _*)).getField("j")
  }

  /** Large-k assignment: ALL centroid dot products through one codegen'd
    * `mat_vec` kernel (FAISS's flat-IVF assignment shape — one primitive
    * loop over a k×d matrix) instead of k separate expression nodes. At
    * derived-k scale (k grows with the corpus, e.g. SemDeDup's
    * k = n/64) the struct formulation becomes a k-wide expression tree —
    * plan bloat and a codegen-size hazard; this stays one node at any k.
    */
  private[graft] def clusterOfMatVec(vecCol: Column,
                                     centroids: Array[Array[Double]]): Column = {
    val cn = centroids.map(c => c.map(x => x * x).sum).toSeq
    val dots = graft.functions.PqColumns.matVec(vecCol, centroids)
    val scored = transform(dots, (d, j) =>
      struct((d * -2.0d + element_at(typedLit(cn), j + 1)).as("d"), j.as("j")))
    array_min(scored).getField("j")
  }

  private def clusterOf(vecCol: Column, centroids: Array[Array[Double]]): Column =
    if (centroids.length <= 16) clusterOfStruct(vecCol, centroids)
    else clusterOfMatVec(vecCol, centroids)

  /** Attach the IVF cluster id. */
  def withCluster(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("__cluster", clusterOf(q(vecCol), model.centroids))

  /** Train the coarse quantizer with Lloyd iterations. The projected
    * (id, vector) training frame is cached for the duration of training —
    * every iteration runs an action, and without the cache each one
    * re-scans (and re-filters, when the caller passes a sample of) the
    * source parquet (VERDICT r2 finding #2: a 3.1x regression at sf0.1).
    */
  def train(df: DataFrame, vecCol: String, idCol: String, k: Int,
            iters: Int = 5): Model = {
    val vecs = df
      .select(q(idCol).as("__id"), q(vecCol).cast("array<double>").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Array[Array[Double]] = vecs
        .orderBy(col("__id")).limit(k)
        .select(col("__v"))
        .collect().map(_.getSeq[Double](0).toArray)
      for (_ <- 1 to iters) {
        val assigned = vecs.withColumn("__cluster", clusterOf(col("__v"), centroids))
        val sums = assigned
          .select(col("__cluster"), posexplode(col("__v")).as(Seq("__pos", "__x")))
          .groupBy("__cluster", "__pos")
          .agg(avg("__x").as("__mean"))
          .collect()
        val next = Array.tabulate(centroids.length)(j => centroids(j).clone())
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
        }
        centroids = next
      }
      Model(centroids)
    } finally vecs.unpersist(blocking = false)
  }

  /** Cosine top-k scanning only the `nProbe` clusters nearest the query. */
  def topK(df: DataFrame, vecCol: String, idCol: String, model: Model,
           query: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val probes = model.nearestClusters(query).take(nProbe)
    Similarity.bruteForceTopK(
      withCluster(df, vecCol, model)
        .where(col("__cluster").isin(probes.map(Integer.valueOf): _*)),
      vecCol, idCol, query, k)
  }

  /** Persist partitioned by cluster — probe reads become partition-pruned. */
  def writeClustered(df: DataFrame, vecCol: String, model: Model, path: String): Unit =
    withCluster(df, vecCol, model)
      .withColumnRenamed("__cluster", "cluster")
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
}
