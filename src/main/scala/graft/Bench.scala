package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry point: runs every registered query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query timings.
  *
  * Each query is executed `SPARK_GRAFT_REPS` times (default 3) and the
  * reported number is the MEDIAN — single-shot timings at this scale carry
  * ±5s of run-to-run noise, which repeatedly faked regressions in earlier
  * rounds. `"queries"` holds the medians (and `total` their sum);
  * `"queries_min"` is kept as a secondary signal.
  *
  * `SPARK_GRAFT_QUERIES` (comma-separated substring filter) restricts the
  * set for local iteration, e.g. SPARK_GRAFT_QUERIES=q50,q57.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val filter = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(',').map(_.trim).filter(_.nonEmpty))
    val spark = Sessions.init(Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-listing paths so the first measured query
    // doesn't absorb session startup.
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).collect()
    } catch { case _: Throwable => () }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      filter.forall(_.exists(name.contains))
    }
    def medianMin(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame) = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (times(times.length / 2), times.head)
    }
    // Serving/gate split for the gated queries: time the gate-free
    // (serving-only) variant too, so a regression in the real operator
    // can't hide inside verification-gate noise. gate = full - serving,
    // clamped at 0 (run-to-run noise can invert tiny differences).
    //
    // The split is measured IMMEDIATELY after that query's full reps, not
    // in a second loop after the whole suite: by the end of a 110-query
    // run the session has hours of localCheckpoint'd RDD blocks awaiting
    // GC-driven ContextCleaner cleanup, and late-run split entries were
    // measured up to 4x slower than fresh-session medians (r10 artifact
    // read serving > full for q82/q87). Session state is also cleared
    // between queries so one query's leaked cache can't tax the next.
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, (Double, Double))]
    val splits = scala.collection.mutable.ArrayBuffer.empty[(String, (Double, Double))]
    selected.foreach { case (name, fn) =>
      val full = medianMin(fn)
      results += name -> full
      SparkEntry.servingQueries.get(name).foreach { sfn =>
        val serv = medianMin(sfn)._1
        splits += name -> (serv, math.max(0.0, full._1 - serv))
      }
      spark.catalog.clearCache()
      System.gc()
    }
    def jsonMap(f: ((Double, Double)) => Double) = results
      .map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val splitJson = splits
      .map { case (k, (s, g)) => s"\"$k\":{\"serving\":$s,\"gate\":$g}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"queries":${jsonMap(_._1)},"queries_min":${jsonMap(_._2)},"serving_split":$splitJson,"sf":"$sfDir"}"""
    println(line)
    // The driver's BENCH_r{N}.json truncates stdout at 2,000 chars, which
    // loses most per-query timings; persist the complete artifact so every
    // round's full surface is diffable (SPARK_GRAFT_BENCH_OUT overrides).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath), (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
  }
}
