package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev-only: write `.explain("formatted")` for the named queries to
  * `<outDir>/<query>_<tag>.txt` (`runMain graft.tools.ExplainDump
  * <outDir> <tag> <q1,q2,...> [dir]`). Not part of the shipped surface.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = Sessions.init(Sessions.builder("local[32]", 32).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"wrote $outDir/${name}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
