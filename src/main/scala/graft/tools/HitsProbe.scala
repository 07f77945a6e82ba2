package graft.tools
/** Dev-only: print the recall_hits column of a gated ANN query. */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.init(graft.Sessions.builder("local[16]", 16).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, args.head)
      val hits = df.select("recall_hits").head(1).map(_.getLong(0))
      println(s"[hits] $q recall_hits=${hits.mkString}")
    }
    spark.stop()
  }
}
