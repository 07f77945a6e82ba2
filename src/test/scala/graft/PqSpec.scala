package graft

import org.apache.spark.sql.functions._
import graft.operators.Pq

class PqSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf("sf0.01"), "embeddings")
  private lazy val model = Pq.train(emb, "embedding", "vec_id", dim = 64, m = 8, k = 16, iters = 3)

  test("encode: m byte codes per vector, deterministic, codegen-compatible") {
    val codes = Pq.encode(emb, "embedding", model)
    val c1 = codes.select("vec_id", "__pq").as[(Long, Seq[Byte])].collect().toMap
    assert(c1.size === 500 && c1.values.forall(_.length === 8))
    val c2 = Pq.encode(emb, "embedding", model)
      .select("vec_id", "__pq").as[(Long, Seq[Byte])].collect().toMap
    assert(c1 === c2)
    // the encode projection stays inside whole-stage codegen
    val df = Pq.encode(emb, "embedding", model)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!finalPlan.linesIterator.exists(l => l.contains("- Project") && !l.contains("*(")))
  }

  test("ADC distance equals the exact reconstruction distance (kernel parity)") {
    val query = (0 until 64).map(i => math.sin(i * 0.37) * 2.0)
    val table = model.adcTable(query)
    val rows = Pq.encode(emb, "embedding", model)
      .select(col("vec_id"), col("__pq"),
        graft.functions.PqColumns.pqAdc(col("__pq"), table).as("adc"))
      .as[(Long, Seq[Byte], Double)].collect()
    rows.foreach { case (_, codes, adc) =>
      // reconstruct from the codebook, compute |q - reconstruction|^2
      val recon = codes.zipWithIndex.flatMap { case (c, j) =>
        model.codebooks(j)(c & 0xFF)
      }
      val exact = query.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(adc - exact) < 1e-9)
    }
  }

  test("ADC top-k recall against the exact L2 brute force") {
    val query = emb.where(col("vec_id") === 7L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val encoded = Pq.encode(emb, "embedding", model)
    val approx = Pq.adcTopK(encoded, "vec_id", model, query, k = 10)
      .select("vec_id").as[Long].collect().toSet
    // exact top-10 by squared L2 = top-10 by (|v|^2 - 2 q.v)
    import graft.functions.VectorFns
    val exact = emb.select(col("vec_id"),
        (VectorFns.dot(col("embedding"), col("embedding")) -
          VectorFns.dot(col("embedding"), VectorFns.vecLit(query)) * 2.0).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .select("vec_id").as[Long].collect().toSet
    // the query vector itself must be found, and recall must be solid
    assert(approx.contains(7L))
    val recall = approx.intersect(exact).size / 10.0
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("OPQ: identity rotation reproduces the unrotated model bit-for-bit") {
    val eye = Array.tabulate(64, 64)((i, j) => if (i == j) 1.0 else 0.0)
    val rotModel = Pq.train(emb, "embedding", "vec_id", dim = 64, m = 8, k = 16,
      iters = 3, rotation = Some(eye))
    // identical codebooks (identity rotation changes no training input)...
    assert(rotModel.codebooks.flatten.flatten.toSeq === model.codebooks.flatten.flatten.toSeq)
    // ...identical codes and ADC tables
    val plain = Pq.encode(emb, "embedding", model)
      .select("vec_id", "__pq").as[(Long, Seq[Byte])].collect().toMap
    val rot = Pq.encode(emb, "embedding", rotModel)
      .select("vec_id", "__pq").as[(Long, Seq[Byte])].collect().toMap
    assert(rot === plain)
    val query = (0 until 64).map(i => math.sin(i * 0.19))
    assert(rotModel.adcTable(query).flatten.toSeq === model.adcTable(query).flatten.toSeq)
  }

  test("OPQ: learned rotation is orthonormal and preserves distances") {
    val r = Pq.trainRotation(emb, "embedding", dim = 64, m = 8)
    assert(r.length === 64 && r.forall(_.length === 64))
    // R · Rᵀ == I (rows orthonormal)
    for (i <- 0 until 64; j <- i until 64) {
      val dot = (0 until 64).map(d => r(i)(d) * r(j)(d)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)")
    }
    // rotation invariance: |R a - R b| == |a - b| on a sample pair
    val vs = emb.where(col("vec_id").isin(1L, 2L))
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    def rot(v: Array[Double]) = r.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    val raw = vs(0).zip(vs(1)).map { case (a, b) => (a - b) * (a - b) }.sum
    val rotd = rot(vs(0)).zip(rot(vs(1))).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(math.abs(raw - rotd) < 1e-9)
  }

  test("ADC shortlist + exact re-rank: recall dominates plain ADC, exact scores") {
    import graft.functions.VectorFns
    val query = (0 until 64).map(i => math.cos(i * 0.31) * 1.3)
    val encoded = Pq.encode(emb, "embedding", model)
    val exact = emb.select(col("vec_id"),
        (VectorFns.dot(col("embedding"), col("embedding")) -
          VectorFns.dot(col("embedding"), VectorFns.vecLit(query)) * 2.0).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(25)
      .select("vec_id").as[Long].collect().toSet
    val plain = Pq.adcTopK(encoded, "vec_id", model, query, 25)
      .select("vec_id").as[Long].collect().toSet
    val rr = Pq.adcTopKRerank(encoded, emb, "embedding", "vec_id", model,
      query, 25, shortlist = 200)
    val rrIds = rr.select("vec_id").as[Long].collect().toSet
    assert(rrIds.intersect(exact).size >= plain.intersect(exact).size)
    assert(rrIds.intersect(exact).size >= 15)     // shortlist-200 regime
    // re-ranked scores are EXACT (match the brute-force formula per id)
    val exactD = emb.select(col("vec_id"),
        (VectorFns.dot(col("embedding"), col("embedding")) -
          VectorFns.dot(col("embedding"), VectorFns.vecLit(query)) * 2.0).as("d"))
      .as[(Long, Double)].collect().toMap
    rr.as[(Long, Double)].collect().foreach { case (id, d) =>
      assert(math.abs(d - exactD(id)) < 1e-9)
    }
  }

  test("IVF-PQ layout: partition-pruned compressed probes, vectors not stored") {
    import graft.operators.Ivf
    val ivf = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/corpus"
    Pq.writeIvfPq(emb, "embedding", "vec_id", ivf, model, path)

    val stored = spark.read.parquet(path)
    assert(stored.columns.sorted.toSeq === Seq("__pq", "cluster", "vec_id"))
    assert(stored.count() === 500)

    val query = (0 until 64).map(i => math.cos(i * 0.21) * 1.5)
    val probe = Pq.ivfPqTopK(spark, path, "vec_id", ivf, model, query, k = 10, nProbe = 3)
    // partition pruning is in the plan, not just the result
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster"), plan.linesIterator.filter(_.contains("PartitionFilters")).mkString)
    val got = probe.select("vec_id").as[Long].collect().toSet
    assert(got.size === 10)
    // full-probe IVF-PQ == plain ADC over everything (pruning-only diff)
    val all = Pq.ivfPqTopK(spark, path, "vec_id", ivf, model, query, k = 10, nProbe = 8)
      .select("vec_id").as[Long].collect().toSet
    val flat = Pq.adcTopK(Pq.encode(emb, "embedding", model), "vec_id", model, query, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(all === flat)
  }

  test("residual IVF-PQ (IVFADC): residual ADC == exact reconstruction, pruned probes") {
    import graft.operators.Ivf
    import graft.functions.VectorFns
    val ivf = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 2)
    val resModel = Pq.trainResidual(emb, "embedding", "vec_id", ivf,
      dim = 64, m = 8, k = 16, iters = 3)

    val rawPath = java.nio.file.Files.createTempDirectory("ivfpq_raw").toString + "/c"
    val resPath = java.nio.file.Files.createTempDirectory("ivfpq_res").toString + "/c"
    Pq.writeIvfPq(emb, "embedding", "vec_id", ivf, model, rawPath)
    Pq.writeIvfPqResidual(emb, "embedding", "vec_id", ivf, resModel, resPath)

    def exactTop(query: Seq[Double], k: Int): Set[Long] =
      emb.select(col("vec_id"),
          (VectorFns.dot(col("embedding"), col("embedding")) -
            VectorFns.dot(col("embedding"), VectorFns.vecLit(query)) * 2.0).as("d"))
        .orderBy(col("d").asc, col("vec_id").asc).limit(k)
        .select("vec_id").as[Long].collect().toSet

    // MECHANISM parity (the IVFADC invariant): for every stored row, the
    // per-cluster residual ADC distance equals the exact distance from the
    // query to (centroid + decoded residual). Recall COMPARISONS vs raw
    // codes are not asserted — residual coding wins on clustered data, and
    // these synthetic embeddings are near-uniform (coarse clusters capture
    // no structure), so either ordering is statistically legitimate.
    val query = (0 until 64).map(i => math.sin(i * 0.53) * 1.2)
    val stored = spark.read.parquet(resPath)
      .select(col("vec_id"), col("__pq"), col("cluster"))
      .as[(Long, Seq[Byte], Int)].collect()
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    stored.take(100).foreach { case (id, codes, cl) =>
      val qRes = query.zip(ivf.centroids(cl)).map { case (a, b) => a - b }
      val table = resModel.adcTable(qRes)
      val adc = codes.zipWithIndex.map { case (c, j) => table(j)(c & 0xFF) }.sum
      val recon = codes.zipWithIndex.flatMap { case (c, j) =>
        resModel.codebooks(j)(c & 0xFF)
      }
      // exact |(q - centroid) - decodedResidual|^2 == |q - (centroid + decoded)|^2
      val exactD = qRes.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(adc - exactD) < 1e-9, s"row $id cluster $cl")
    }

    // Retrieval sanity: a corpus vector's own id is its nearest neighbor
    // through the residual path, and the probe's plan partition-prunes.
    Seq(3L, 42L, 250L).foreach { id =>
      val q0 = vecs(id)
      val res = Pq.ivfPqResidualTopK(spark, resPath, "vec_id", ivf, resModel, q0, 10, nProbe = 8)
      val got = res.select("vec_id").as[Long].collect().toSet
      assert(got.contains(id), s"self-retrieval failed for $id")
      assert(got.intersect(exactTop(q0, 10)).nonEmpty)
    }
    val pruned = Pq.ivfPqResidualTopK(spark, resPath, "vec_id", ivf, resModel, query, 5, nProbe = 2)
    assert(pruned.queryExecution.executedPlan.toString.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("cluster")))
    assert(pruned.count() === 5)
  }

  test("composed in-plan IVFADC+rerank: full probe + full shortlist == exact top-k") {
    import graft.operators.Ivf
    import graft.functions.VectorFns
    val ivf = Ivf.train(emb, "embedding", "vec_id", k = 8, iters = 2)
    val resModel = Pq.trainResidual(emb, "embedding", "vec_id", ivf,
      dim = 64, m = 8, k = 16, iters = 2, withRotation = true)
    val query = (0 until 64).map(i => math.cos(i * 0.41) * 1.5)
    // With every cluster probed and the shortlist spanning the corpus, the
    // ADC stage cannot lose a neighbor — the exact re-rank must reproduce
    // the exact top-k EXACTLY (ids, order and scores).
    val exact = emb.select(col("vec_id"),
        (VectorFns.dot(col("embedding"), col("embedding")) -
          VectorFns.dot(col("embedding"), VectorFns.vecLit(query)) * 2.0).as("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc).limit(10)
      .as[(Long, Double)].collect().toSeq
    val composed = Pq.ivfAdcTopKRerank(emb, "embedding", "vec_id", ivf, resModel,
        query, k = 10, nProbe = 8, shortlist = 500)
      .as[(Long, Double)].collect().toSeq
    assert(composed === exact)
    // Restricted probes still recall most of the exact top (near-uniform
    // corpus, 3 of 8 clusters probed).
    val prunedTop = Pq.ivfAdcTopKRerank(emb, "embedding", "vec_id", ivf, resModel,
        query, k = 10, nProbe = 3, shortlist = 100)
      .select("vec_id").as[Long].collect().toSet
    assert(prunedTop.size === 10)
    assert(prunedTop.intersect(exact.map(_._1).toSet).size >= 3)
  }
}
