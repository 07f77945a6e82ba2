package graft.tools
import graft.{Sessions, SparkEntry}

/** Run one registered query against one sf dir and print its row count —
  * local iteration helper (`runMain graft.tools.QuickQ <name> <dir> [serving]`).
  */
object QuickQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val serving = args.length > 2 && args(2) == "serving"
    val spark = Sessions.init(Sessions.builder("local[8]", 8).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val fn = if (serving) SparkEntry.servingQueries(name) else SparkEntry.queries(name)
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    println(f"QUICKQ $name serving=$serving rows=$n t=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
