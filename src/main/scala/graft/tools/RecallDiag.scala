package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.operators.{Ivf, Pq, Similarity}
import graft.functions.VectorFns
import graft.queries.VectorQueries.probe

/** Dev diagnostic: measured recall@25 of each approximate ANN path vs its
  * exact baseline (not part of the driver contract).
  */
object RecallDiag {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.init(Sessions.builder("local[8]", 8).appName("recall-diag").getOrCreate())
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = Tables(spark, dir, "embeddings")

    val exactCos = Similarity.bruteForceTopK(emb, "embedding", "vec_id", probe, 25).select("vec_id")
    def hits(approx: org.apache.spark.sql.DataFrame, exact: org.apache.spark.sql.DataFrame): Long =
      approx.join(exact, Seq("vec_id"), "left_semi").count()

    val lsh = Similarity.lshTopK(emb, "embedding", "vec_id", probe, 25, nBits = 8, multiProbe = true)
    println(s"LSH   rows=${lsh.count()} hits=${hits(lsh, exactCos)}")

    val sample = emb.where(pmod(hash(col("vec_id")), lit(4)) === 0)
    val ivfM = Ivf.train(sample, "embedding", "vec_id", k = 16, iters = 2)
    val ivf = Ivf.topK(emb, "embedding", "vec_id", ivfM, probe, 25, nProbe = 6)
    println(s"IVF   rows=${ivf.count()} hits=${hits(ivf, exactCos)}")

    val pqM = Pq.train(sample, "embedding", "vec_id", dim = 64, m = 8, k = 16, iters = 2)
    val pq = Pq.adcTopK(Pq.encode(emb, "embedding", pqM), "vec_id", pqM, probe, 25)
    val exactL2 = emb.select(col("vec_id"),
        (VectorFns.dot(col("embedding"), col("embedding")) -
          VectorFns.dot(col("embedding"), VectorFns.vecLit(probe)) * 2.0d).as("__d"))
      .orderBy(col("__d").asc, col("vec_id").asc).limit(25).select("vec_id")
    println(s"PQ    rows=${pq.count()} hits=${hits(pq, exactL2)} hitsVsCos=${hits(pq, exactCos)}")

    val rot = Pq.trainRotation(sample, "embedding", dim = 64, m = 8)
    val opqM = Pq.train(sample, "embedding", "vec_id", dim = 64, m = 8, k = 16,
      iters = 2, rotation = Some(rot))
    val opq = Pq.adcTopK(Pq.encode(emb, "embedding", opqM), "vec_id", opqM, probe, 25)
    println(s"OPQ   rows=${opq.count()} hits=${hits(opq, exactL2)} hitsVsCos=${hits(opq, exactCos)}")

    for (sl <- Seq(50, 100, 200)) {
      val rr = Pq.adcTopKRerank(Pq.encode(emb, "embedding", opqM), emb,
        "embedding", "vec_id", opqM, probe, 25, shortlist = sl)
      println(s"OPQ+rerank($sl) rows=${rr.count()} hits=${hits(rr, exactL2)}")
    }
    spark.stop()
  }
}
