package graft.tools

import java.nio.file.{Files, Paths}

/** Dev-only: [[graft.Verify]] restricted to a comma-separated query-name
  * substring filter — dumps just those queries' parquet plus an
  * oracle_sql.json restricted to them, so `tools/check.py` runs the
  * DuckDB compare on a subset while iterating on new oracles:
  *
  *   runMain graft.tools.VerifySome /root/testdata/sf0.001 /tmp/vs q115,q116
  *   python3 tools/check.py /root/testdata/sf0.001 /tmp/vs
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, filter) = args
    val pats = filter.split(',').map(_.trim).filter(_.nonEmpty)
    val spark = graft.Sessions.init(
      graft.Sessions.builder("local[8]", 8).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val sel = graft.SparkEntry.queries.filter { case (n, _) => pats.exists(n.contains) }
    sel.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verifysome] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .filter { case (n, _) => pats.exists(n.contains) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
