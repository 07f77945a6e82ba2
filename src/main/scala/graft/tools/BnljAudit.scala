package graft.tools

/** Dev diagnostic: list queries whose physical plan contains a nested-loop
  * or cartesian join (expected: only the 1-row Gates crossjoins and the
  * documented small-probe q45).
  */
object BnljAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.init(graft.Sessions.builder("local[8]", 8).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.SimpleMode)
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        val cart = "CartesianProduct".r.findAllIn(plan).size
        if (bnlj + cart > 0) println(s"[bnlj] $name bnlj=$bnlj cartesian=$cart")
      } catch { case e: Throwable => println(s"[bnlj] $name ERROR ${e.getMessage.take(80)}") }
    }
    println("[bnlj] done")
    spark.stop()
  }
}
