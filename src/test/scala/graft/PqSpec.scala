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
}
