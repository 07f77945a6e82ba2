package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}

/** Dev-only: locate q104's cost — probe fan-out vs candidate volume vs
  * verify.
  */
object Q104Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.init(Sessions.builder("local[32]", 32).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q104prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val part = Tables(spark, sfDir, "part")
    val strings = part.select(col("p_partkey").as("id"), col("p_name").as("s"))
      .unionByName(part.where(pmod(col("p_partkey"), lit(10)) === 0)
        .select((col("p_partkey") + 1000000L).as("id"),
          concat(lit("q"), expr("substring(p_name, 2)")).as("s")))
      .cache()
    time("strings")(println(s"  n=${strings.count()}"))

    val tau = 1; val segs = tau + 1
    val base = strings.withColumn("len", length(col("s")))
    def widthOf(l: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      floor(l / segs).cast("int") + when(i < l % segs, 1).otherwise(0)
    def startOf(l: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (i * floor(l / segs).cast("int") + least(i, l % segs)).cast("int")
    val iSeq = sequence(lit(0), lit(tau))
    val idx = base.select(col("id").as("id_i"),
        explode(transform(iSeq, i =>
          struct(col("len").as("klen"), i.as("seg"),
            col("s").substr(startOf(col("len"), i) + 1,
              widthOf(col("len"), i)).as("kstr")))).as("k"))
      .select(col("id_i"), col("k.klen"), col("k.seg"), col("k.kstr"))
    val emptyKeys = array().cast("array<struct<klen:int,seg:int,kstr:string>>")
    val probe = base.select(col("id").as("id_p"),
        explode(array_distinct(flatten(flatten(transform(
          sequence(greatest(col("len") - tau, lit(0)).cast("int"),
            (col("len") + tau).cast("int")),
          l => transform(iSeq, i => {
            val w = widthOf(l, i)
            val st = startOf(l, i)
            val qlo = greatest(st - tau, lit(0))
            val qhi = least(st + tau, col("len") - w)
            when(qhi >= qlo,
              transform(sequence(qlo, qhi), q =>
                struct(l.cast("int").as("klen"), i.as("seg"),
                  col("s").substr(q + 1, w).as("kstr"))))
              .otherwise(emptyKeys)
          })))))).as("k"))
      .select(col("id_p"), col("k.klen"), col("k.seg"), col("k.kstr"))
    time("probe fanout")(println(s"  probeRows=${probe.count()}"))
    time("idx fanout")(println(s"  idxRows=${idx.count()}"))
    val cand = probe.join(idx,
        probe("klen") === idx("klen") && probe("seg") === idx("seg") &&
          probe("kstr") === idx("kstr") && probe("id_p") =!= idx("id_i"))
      .select(least(col("id_p"), col("id_i")).as("id_a"),
        greatest(col("id_p"), col("id_i")).as("id_b"))
    time("raw candidates")(println(s"  cand=${cand.count()}"))
    val dist = cand.distinct()
    time("distinct candidates")(println(s"  candDistinct=${dist.count()}"))
    // hot buckets
    val hot = idx.groupBy("klen", "seg", "kstr").count()
      .orderBy(col("count").desc).limit(5).collect()
    println("  hot idx buckets: " + hot.mkString(" | "))
    spark.stop()
  }
}
