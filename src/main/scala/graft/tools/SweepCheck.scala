package graft.tools
import graft.{Sessions, SparkEntry}

/** Dev-only: verify the post-action checkpoint-block sweep — runs a query
  * twice and prints the persistent-RDD count after each consuming action
  * (`runMain graft.tools.SweepCheck <name> [dir]`). Not part of the
  * shipped surface.
  */
object SweepCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.init(Sessions.builder("local[8]", 8).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { rep =>
      val df = SparkEntry.queries(name)(spark, dir)
      val during = spark.sparkContext.getPersistentRDDs.size
      val n = df.count()
      Thread.sleep(300) // listener bus is async
      val after = spark.sparkContext.getPersistentRDDs.size
      println(s"SWEEPCHECK rep=$rep rows=$n persistentRdds during=$during after=$after")
    }
    spark.stop()
  }
}
