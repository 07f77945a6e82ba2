package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PqColumns

/** Product quantization ANN: compress each d-dim embedding to `m` byte
  * codes (one per subspace, k<=256 sub-centroids each) and score probes
  * against the compressed corpus with asymmetric distance computation.
  *
  * The 100 TB story this adds on top of IVF/LSH bucketing: those prune
  * WHICH vectors a probe reads; PQ shrinks WHAT is read per vector —
  * 64-dim float32 (256 B) -> 8 codes (8 B), a 32x scan-size reduction, so
  * an exhaustive compressed scan of a 100 TB corpus touches ~3 TB, and a
  * cluster-pruned one touches gigabytes. Encode is write-time map work;
  * probes never decompress (one m-step table walk per row, codegen'd).
  * Compose with [[Ivf]] (partition by cluster, PQ-score within probed
  * partitions) for the standard IVF-PQ layout.
  *
  * Training reuses the deterministic DataFrame-native Lloyd loop of
  * [[Ivf.train]] once per subspace — offline, metadata-sized output.
  */
object Pq {

  /** @param rotation optional OPQ rotation R (d x d orthonormal, row-major):
    *   codes quantize R·v and queries are rotated before table build.
    *   Orthonormality makes rotated L2 equal raw L2, so ADC still
    *   approximates the SAME distances — the rotation only redistributes
    *   variance so every sub-quantizer carries comparable information.
    *   None = identity (the pre-OPQ behavior, bit-for-bit).
    */
  final case class Model(m: Int, dsub: Int, codebooks: Array[Array[Array[Double]]],
                         rotation: Option[Array[Array[Double]]] = None) {
    require(codebooks.length == m)

    private[Pq] def rotate(query: Seq[Double]): Seq[Double] = rotation match {
      case None    => query
      case Some(r) =>
        val q = query.toArray
        r.map { row =>
          var s = 0.0; var j = 0
          while (j < row.length) { s += row(j) * q(j); j += 1 }
          s
        }.toSeq
    }

    /** Per-query ADC lookup table: table(j)(c) = |q'_j - codebook(j)(c)|^2
      * with q' = R·q under an OPQ rotation.
      */
    def adcTable(query: Seq[Double]): Array[Array[Double]] = {
      val rq = rotate(query)
      Array.tabulate(m) { j =>
        val qj = rq.slice(j * dsub, (j + 1) * dsub).toArray
        codebooks(j).map { cent =>
          var d = 0.0; var i = 0
          while (i < dsub) { val x = qj(i) - cent(i); d += x * x; i += 1 }
          d
        }
      }
    }
  }

  private def q(n: String): Column = col(s"`$n`")

  /** Train m sub-quantizers of k centroids each over `vecCol` (dim d,
    * d % m == 0). Deterministic (seedless init from the k smallest ids,
    * like [[Ivf.train]]); ALL subspaces advance together — one Spark job
    * per Lloyd iteration, not per (subspace x iteration).
    */
  def train(df: DataFrame, vecCol: String, idCol: String, dim: Int,
            m: Int = 8, k: Int = 16, iters: Int = 5,
            rotation: Option[Array[Array[Double]]] = None): Model = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val dsub = dim / m
    val vecCol0 = rotation match {
      case None    => q(vecCol).cast("array<double>")
      case Some(r) => graft.functions.PqColumns.matVec(q(vecCol), r)
    }
    // Cached for training: one action per Lloyd iteration, and an uncached
    // frame would re-scan the source parquet each time (VERDICT r2 #2).
    val vecs = df.select(q(idCol).as("__id"), vecCol0.as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {

    // init: sub-centroid c of subspace j = slice j of the vector with the
    // c-th smallest id (identical to running Ivf.train's init per slice)
    val init = vecs.orderBy(col("__id")).limit(k)
      .select(col("__v")).collect().map(_.getSeq[Double](0).toArray)
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => init.map(_.slice(j * dsub, (j + 1) * dsub)))

    for (_ <- 1 to iters) {
      // per-row cluster per subspace: argmin over k of (-2 v_j.c + |c|^2)
      val clusterCols = (0 until m).map { j =>
        val sub = slice(col("__v"), j * dsub + 1, dsub)
        val scored = codebooks(j).zipWithIndex.map { case (c, ci) =>
          val cNorm2 = c.map(x => x * x).sum
          struct(
            (graft.functions.VectorFns.dot(sub, graft.functions.VectorFns.vecLit(c.toSeq)) * -2.0d + cNorm2).as("d"),
            lit(ci).as("j"))
        }
        array_min(array(scored: _*)).getField("j")
      }
      // one shuffle: (sub, cluster, posInSub) -> mean
      val means = vecs
        .withColumn("__cl", array(clusterCols: _*))
        .select(col("__cl"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .select(
          (col("__pos") / dsub).cast("int").as("__sub"),
          element_at(col("__cl"), (col("__pos") / dsub).cast("int") + 1).as("__c"),
          pmod(col("__pos"), lit(dsub)).cast("int").as("__p"),
          col("__x"))
        .groupBy("__sub", "__c", "__p").agg(avg("__x").as("__mean"))
        .collect()
      val next = codebooks.map(_.map(_.clone()))    // empty clusters keep their centroid
      means.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
      }
      codebooks = next
    }
    Model(m, dsub, codebooks, rotation)
    } finally vecs.unpersist(blocking = false)
  }

  /** OPQ-P rotation (Ge et al., CVPR'13 "Optimized Product Quantization",
    * parametric variant — public method, re-derived for Spark): rotate into
    * the centered-PCA basis, allocating principal directions to subspaces
    * so the PRODUCT of eigenvalues per subspace balances (greedy on log
    * sums, largest eigenvalue first). Each 8-bit sub-quantizer then carries
    * comparable variance instead of one subspace hoarding the signal —
    * measurably better recall at an identical code budget.
    *
    * Execution shape: one distributed treeAggregate builds the d-vector
    * mean and d x d second-moment (metadata-sized: 64x64 doubles); the
    * eigendecomposition is driver-side (breeze eigSym, symmetric d x d).
    * Returns the row-major orthonormal R for [[train]]/[[Model]].
    */
  def trainRotation(df: DataFrame, vecCol: String, dim: Int, m: Int): Array[Array[Double]] = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val dsub = dim / m
    val data = df.select(q(vecCol).cast("array<double>").as("__v"))
      .rdd.map(_.getSeq[Double](0).toArray)
    val zero = (0L, new Array[Double](dim), Array.ofDim[Double](dim, dim))
    val (n, sum, mom) = data.treeAggregate(zero)(
      seqOp = { case ((n0, s, mm), v) =>
        var i = 0
        while (i < dim) {
          s(i) += v(i)
          val row = mm(i); val vi = v(i)
          var j = 0
          while (j < dim) { row(j) += vi * v(j); j += 1 }
          i += 1
        }
        (n0 + 1, s, mm)
      },
      combOp = { case ((na, sa, ma), (nb, sb, mb)) =>
        var i = 0
        while (i < dim) {
          sa(i) += sb(i)
          val ra = ma(i); val rb = mb(i)
          var j = 0
          while (j < dim) { ra(j) += rb(j); j += 1 }
          i += 1
        }
        (na + nb, sa, ma)
      })
    require(n > 0, "trainRotation needs a non-empty frame")
    // centered covariance C = E[xxT] - mu muT (column-major for breeze;
    // symmetric, so the layout choice is moot)
    val mu = sum.map(_ / n)
    val flat = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) { flat(j * dim + i) = mom(i)(j) / n - mu(i) * mu(j); j += 1 }
      i += 1
    }
    val es = breeze.linalg.eigSym(new breeze.linalg.DenseMatrix(dim, dim, flat))
    // Greedy eigenvalue balancing: descending eigenvalues, each assigned to
    // the unfilled subspace with the smallest log-product so far.
    val order = (0 until dim).sortBy(d => -es.eigenvalues(d))
    val cap = Array.fill(m)(dsub)
    val logSum = Array.fill(m)(0.0)
    val assigned = Array.fill(m)(List.empty[Int])
    order.foreach { e =>
      val j = (0 until m).filter(cap(_) > 0).minBy(logSum)
      assigned(j) = e :: assigned(j)
      cap(j) -= 1
      logSum(j) += math.log(math.max(es.eigenvalues(e), 1e-12))
    }
    // Row i of R = the eigenvector for the i-th output dimension
    // (subspace-major): R x projects x onto the permuted PCA basis.
    val rows = assigned.toSeq.flatMap(_.reverse)
    rows.map(e => Array.tabulate(dim)(d => es.eigenvectors(d, e))).toArray
  }

  /** Write-time encoding: adds `codesCol` (array<byte>, length m). Applies
    * the model's OPQ rotation (if any) inside the same codegen stage.
    */
  def encode(df: DataFrame, vecCol: String, model: Model,
             codesCol: String = "__pq"): DataFrame = {
    val v = model.rotation match {
      case None    => q(vecCol)
      case Some(r) => PqColumns.matVec(q(vecCol), r)
    }
    df.withColumn(codesCol, PqColumns.pqEncode(v, model.codebooks))
  }

  /** Top-k nearest (approximate, squared L2) of `query` over an encoded
    * corpus: one compressed scan + per-partition heaps (no full sort).
    */
  def adcTopK(encoded: DataFrame, idCol: String, model: Model,
              query: Seq[Double], k: Int,
              codesCol: String = "__pq"): DataFrame =
    encoded
      .select(q(idCol), PqColumns.pqAdc(q(codesCol), model.adcTable(query)).as("adc_dist"))
      .orderBy(col("adc_dist").asc, q(idCol).asc)
      .limit(k)

  /** ADC shortlist + EXACT re-rank (Jégou et al., TPAMI'11 §VII — the
    * standard PQ serving pattern): scan the compressed corpus for a
    * `shortlist`-deep ADC top, then re-rank ONLY those rows with the exact
    * squared-L2 score from their raw vectors. Quantization error then only
    * costs recall when a true neighbor falls outside the whole shortlist —
    * recall@k approaches exact while the corpus scan stays 32x compressed;
    * the raw-vector reads are `shortlist` point lookups, not a scan.
    * Emitted `dist` = |v|² - 2·v·q (monotone in L2; the |q|² constant is
    * dropped), matching the exact baseline's ranking exactly.
    */
  def adcTopKRerank(encoded: DataFrame, raw: DataFrame, vecCol: String,
                    idCol: String, model: Model, query: Seq[Double], k: Int,
                    shortlist: Int = 100, codesCol: String = "__pq"): DataFrame = {
    import graft.functions.VectorFns
    val short = adcTopK(encoded, idCol, model, query, shortlist).select(q(idCol))
    val v = q(vecCol)
    raw.join(broadcast(short), Seq(idCol))
      .select(q(idCol),
        (VectorFns.dot(v, v) - VectorFns.dot(v, VectorFns.vecLit(query)) * 2.0d).as("dist"))
      .orderBy(col("dist").asc, q(idCol).asc)
      .limit(k)
  }

  /** Per-row residual against the row's coarse centroid: v - c(cluster).
    * A when-chain over the k centroid literals + one codegen'd zip_with —
    * no join, no shuffle (centroids are metadata).
    */
  def residualCol(vecCol: Column, clusterCol: Column, ivf: Ivf.Model): Column = {
    val centroid = ivf.centroids.zipWithIndex.tail.foldLeft(
      graft.functions.VectorFns.vecLit(ivf.centroids(0).toSeq)) {
      case (acc, (c, j)) =>
        when(clusterCol === j, graft.functions.VectorFns.vecLit(c.toSeq)).otherwise(acc)
    }
    zip_with(vecCol.cast("array<double>"), centroid, (a, b) => a - b)
  }

  /** Train sub-quantizers on RESIDUALS (v - coarse centroid) — the
    * textbook IVF-PQ composition: residuals concentrate near the origin,
    * so the same code bits carry materially more precision than on raw
    * vectors (Jégou et al., PAMI'11 — "product quantization for nearest
    * neighbor search", IVFADC). `withRotation` additionally trains an OPQ
    * rotation ON THE RESIDUALS (the composed OPQ+IVFADC stack).
    */
  def trainResidual(df: DataFrame, vecCol: String, idCol: String, ivf: Ivf.Model,
                    dim: Int, m: Int = 8, k: Int = 16, iters: Int = 5,
                    withRotation: Boolean = false): Model = {
    val withRes = Ivf.withCluster(df, vecCol, ivf)
      .withColumn("__res", residualCol(q(vecCol), col("__cluster"), ivf))
    val rot = if (withRotation) Some(trainRotation(withRes, "__res", dim, m)) else None
    train(withRes, "__res", idCol, dim, m, k, iters, rot)
  }

  /** The COMPOSED in-plan IVFADC serving stack (Jégou et al., TPAMI'11
    * §VII, IVFADC + re-rank): coarse-cluster pruning feeds a residual-code
    * ADC scan, the shortlist re-ranks exactly from raw vectors.
    *
    *   1. cluster pruning: rows are assigned their coarse cluster (argmin
    *      over centroid literals, map-side) and FILTERED to the `nProbe`
    *      clusters nearest the query before anything else runs — the
    *      in-plan analogue of the partition-pruned read over a
    *      [[writeIvfPqResidual]] layout ([[ivfPqResidualTopK]]), where the
    *      same predicate prunes directories instead;
    *   2. residual ADC: surviving rows encode their residual
    *      (v - centroid) with the residual codebooks, and the ADC distance
    *      uses the table of the row's OWN cluster — the per-cluster tables
    *      (query-residual vs that centroid) branch in one CASE chain, so
    *      each row pays exactly one table walk;
    *   3. shortlist top via per-partition heaps (TakeOrderedAndProject),
    *      then the exact re-rank joins the broadcast shortlist against raw
    *      vectors — identical to [[adcTopKRerank]]'s tail.
    */
  def ivfAdcTopKRerank(raw: DataFrame, vecCol: String, idCol: String,
                       ivf: Ivf.Model, pq: Model, query: Seq[Double], k: Int,
                       nProbe: Int, shortlist: Int = 100): DataFrame = {
    import graft.functions.VectorFns
    val probes = ivf.nearestClusters(query).take(nProbe)
    val pruned = Ivf.withCluster(raw, vecCol, ivf)
      .where(col("__cluster").isin(probes.map(Integer.valueOf): _*))
    val encoded = encode(
      pruned.withColumn("__res", residualCol(q(vecCol), col("__cluster"), ivf)),
      "__res", pq)
    // Per-cluster ADC table on the query's residual against THAT centroid;
    // CASE evaluates only the matching branch, so one table walk per row.
    val dist = probes.map { j =>
      val qRes = query.zip(ivf.centroids(j)).map { case (a, b) => a - b }
      (j, PqColumns.pqAdc(col("__pq"), pq.adcTable(qRes)))
    }.foldRight(lit(Double.MaxValue): Column) { case ((j, d), acc) =>
      when(col("__cluster") === j, d).otherwise(acc)
    }
    val short = encoded.select(q(idCol), dist.as("adc_dist"))
      .orderBy(col("adc_dist").asc, q(idCol).asc)
      .limit(shortlist)
      .select(q(idCol))
    val v = q(vecCol)
    raw.join(broadcast(short), Seq(idCol))
      .select(q(idCol),
        (VectorFns.dot(v, v) - VectorFns.dot(v, VectorFns.vecLit(query)) * 2.0d).as("dist"))
      .orderBy(col("dist").asc, q(idCol).asc)
      .limit(k)
  }

  /** IVF-PQ layout: the corpus written partitioned by coarse IVF cluster
    * with PQ codes precomputed (the raw vector column is DROPPED — codes
    * are the probe-time representation). A probe composes both prunings:
    * partition-pruned cluster reads x 32x-compressed rows.
    */
  def writeIvfPq(df: DataFrame, vecCol: String, idCol: String,
                 ivf: Ivf.Model, pq: Model, path: String): Unit =
    Ivf.withCluster(encode(df, vecCol, pq), vecCol, ivf)
      .withColumnRenamed("__cluster", "cluster")
      .select(q(idCol), col("__pq"), col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Partition-pruned ADC probe over a [[writeIvfPq]] layout. */
  def ivfPqTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                idCol: String, ivf: Ivf.Model, pq: Model,
                query: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val probes = ivf.nearestClusters(query).take(nProbe)
    adcTopK(
      spark.read.parquet(path)
        .where(col("cluster").isin(probes.map(Integer.valueOf): _*)),
      idCol, pq, query, k)
  }

  /** Residual IVF-PQ layout: codes encode v - centroid(cluster), written
    * partitioned by cluster. Use with [[trainResidual]].
    */
  def writeIvfPqResidual(df: DataFrame, vecCol: String, idCol: String,
                         ivf: Ivf.Model, pq: Model, path: String): Unit = {
    val clustered = Ivf.withCluster(df, vecCol, ivf)
      .withColumn("__res", residualCol(q(vecCol), col("__cluster"), ivf))
    encode(clustered, "__res", pq)
      .withColumnRenamed("__cluster", "cluster")
      .select(q(idCol), col("__pq"), col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)
  }

  /** Residual probe (IVFADC): each probed cluster is scored with its OWN
    * ADC table built from the query's residual against that cluster's
    * centroid (q - c_j); per-cluster partition-pruned top-k, then a global
    * top-k over the union. nProbe small scans, one tiny final sort.
    */
  def ivfPqResidualTopK(spark: org.apache.spark.sql.SparkSession, path: String,
                        idCol: String, ivf: Ivf.Model, pq: Model,
                        query: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val probes = ivf.nearestClusters(query).take(nProbe)
    val perCluster = probes.map { j =>
      val qRes = query.zip(ivf.centroids(j)).map { case (a, b) => a - b }
      adcTopK(spark.read.parquet(path).where(col("cluster") === j),
        idCol, pq, qRes, k)
    }
    perCluster.reduce(_.unionAll(_))
      .orderBy(col("adc_dist").asc, q(idCol).asc)
      .limit(k)
  }
}
