package graft.tools
/** Dev-only: row counts of named queries at a given SF (gate sanity),
  * e.g. `runMain graft.tools.RowProbe /root/testdata/sf0.1 q37_simhash`.
  */
object RowProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.init(graft.Sessions.builder("local[16]", 16).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      println(s"[rowprobe] $q rows=" + graft.SparkEntry.queries(q)(spark, args.head).count())
    }
    spark.stop()
  }
}
