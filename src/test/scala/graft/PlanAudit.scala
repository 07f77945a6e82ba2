package graft

/** Plan inspector: `sbt "Test/runMain graft.PlanAudit [query...]"` prints
  * the formatted physical plan of selected queries at sf0.01 — the loop for
  * checking pushdown (PushedFilters/ReadSchema), join strategy, and
  * WholeStageCodegen spans.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.init(Sessions.builder("local[4]", 4).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_agg_pricing", "q03_join_chain", "q08_range_join", "q22_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
