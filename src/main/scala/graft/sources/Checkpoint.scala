package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet stage checkpoint (reference S5/S6,
  * `meertrap/meertrap.py:33-67` `read_or_parse_parquet`): read the stage
  * output if it exists, else compute, persist (gzip parquet like the
  * reference), and return. Gives resumable multi-stage runs.
  */
object Checkpoint {

  def readOrCompute(spark: SparkSession, path: String)(compute: => DataFrame): DataFrame = {
    val exists =
      try {
        spark.read.parquet(path).schema
        true
      } catch { case _: Throwable => false }
    if (exists) spark.read.parquet(path)
    else {
      val df = compute
      df.write.mode("overwrite").option("compression", "gzip").parquet(path)
      spark.read.parquet(path)
    }
  }
}
