package graft

/** Dev-only: measures the cost of DURABLE stage boundaries in the
  * release build — `ReleasePipeline.run` with a parquet `checkpointDir`
  * (crash-resumable) vs the default eager `localCheckpoint` boundaries —
  * at a given SF. Three numbers: in-memory build, cold durable build,
  * and warm resume (all stages complete, pure read-back). Feeds the
  * SCALE.md "durable boundary overhead" row.
  */
object ReleaseCheckpointTime {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.init(Sessions.builder("local[32]", 32).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    import org.apache.spark.sql.functions._
    import graft.corpus.ReleasePipeline

    val docs = Tables(spark, dir, "documents")
    val bench = docs.where(pmod(col("doc_id"), lit(97)) === 0)
    val ref   = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val cand  = docs.where(pmod(col("doc_id"), lit(97)) =!= 0 &&
                           pmod(col("doc_id"), lit(10)) =!= 0)
    val cfg = ReleasePipeline.Config(paragraphDedup = true)

    def timed(name: String)(f: => ReleasePipeline.Result): Long = {
      val t0 = System.nanoTime()
      val r = f
      val n = r.stats.afterLmFloor
      println(f"[relckpt] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n docs)")
      n
    }
    timed("warmup (in-memory)") { ReleasePipeline.run(cand, bench, cfg, Some(ref)) }
    val a = timed("in-memory boundaries") { ReleasePipeline.run(cand, bench, cfg, Some(ref)) }
    val ckpt = java.nio.file.Files.createTempDirectory("relckpt").toString
    val b = timed("durable (cold build)") {
      ReleasePipeline.run(cand, bench, cfg, Some(ref), Some(ckpt)) }
    val c = timed("durable (warm resume)") {
      ReleasePipeline.run(cand, bench, cfg, Some(ref), Some(ckpt)) }
    assert(a == b && b == c, s"modes disagree: $a / $b / $c")
    spark.stop()
  }
}
