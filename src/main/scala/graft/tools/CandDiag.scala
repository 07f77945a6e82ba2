package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Dev diagnostic: prefix-filter candidate counts for the token-cosine path. */
object CandDiag {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.init(Sessions.builder("local[16]", 16).appName("cand-diag").getOrCreate())
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = 0.95
    val docs = Tables(spark, dir, "documents")
    val toks = docs
      .where(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id").as("id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .groupBy("id", "t").agg(count(lit(1)).as("c")).cache()
    println(s"postings=${toks.count()} docs=${toks.select("id").distinct().count()} vocab=${toks.select("t").distinct().count()}")
    val dfreq = toks.groupBy("t").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy(col("df").asc, col("t").asc)
    val ordered = toks.join(dfreq, "t")
      .withColumn("c2", (col("c")*col("c")).cast("double"))
      .withColumn("cum2", sum(col("c2")).over(w.rowsBetween(Long.MinValue, 0)))
      .withColumn("tot2", sum(col("c2")).over(org.apache.spark.sql.expressions.Window.partitionBy("id")))
    val indexed = ordered.where(col("tot2") - (col("cum2") - col("c2")) >= (lit(t*t) - lit(1e-9)) * col("tot2")).select("id","t")
    println(s"indexed=${indexed.count()}")
    val cands = indexed.as("a").join(toks.select(col("id"), col("t")).as("b"),
        col("a.t") === col("b.t") && col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"), greatest(col("a.id"), col("b.id")).as("id_b"))
    println(s"candRows=${cands.count()} candPairs=${cands.distinct().count()}")
    spark.stop()
  }
}
