package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet stage checkpoint (reference S5/S6,
  * `meertrap/meertrap.py:33-67` `read_or_parse_parquet`): read the stage
  * output if it exists, else compute, persist (gzip parquet like the
  * reference), and return. Gives resumable multi-stage runs.
  *
  * Completeness: a stage directory counts as finished ONLY if the
  * committer's `_SUCCESS` marker is present. Spark's FileOutputCommitter
  * moves task files into the target one by one during job commit and
  * writes `_SUCCESS` last, so a run killed mid-commit leaves a
  * readable-but-truncated parquet dir — probing the schema (the
  * reference's `.exists()` idiom) would resume from partial data with
  * no error. On a marker-less dir we recompute and overwrite (the
  * `overwrite` mode clears the torn remains first).
  */
object Checkpoint {

  def readOrCompute(spark: SparkSession, path: String)(compute: => DataFrame): DataFrame = {
    if (isComplete(spark, path)) spark.read.parquet(path)
    else {
      val df = compute
      df.write.mode("overwrite").option("compression", "gzip").parquet(path)
      spark.read.parquet(path)
    }
  }

  /** True iff the directory holds a fully-committed write: the
    * `_SUCCESS` marker exists. A transient FS fault answers `false`
    * (recompute is always correct, just not free).
    */
  def isComplete(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(new Path(p, "_SUCCESS"))
    } catch { case _: java.io.IOException => false }
  }
}
