package graft.load

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exactly-once parquet appends for `foreachBatch` sinks.
  *
  * Structured Streaming guarantees each batch id is DELIVERED at least
  * once to `foreachBatch` — a crash between the sink write and the
  * checkpoint commit re-executes the batch, and a plain
  * `write.mode("append")` then duplicates rows. The reference meets the
  * same need with Dagster-partition idempotency + content-hash dedup
  * (SURVEY §2.10); the Spark-native form is batch-id idempotency:
  *
  *  - every batch writes to its OWN directory `data/batch=<id>` with
  *    OVERWRITE — a retry replaces any partial output instead of
  *    appending to it;
  *  - a zero-byte marker `_committed/<id>` is created only after the
  *    data write succeeds;
  *  - [[read]] unions exactly the marker-committed batch directories, so
  *    partial writes from crashed attempts are invisible.
  *
  * Marker creation is a single filesystem create — atomic on HDFS-like
  * stores and on object stores with atomic PUT visibility. The layout is
  * also what a maintenance compaction would consume (committed dirs in,
  * one compacted dir out, markers swapped).
  */
final class IdempotentParquetSink(val root: String) extends Serializable {

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(id: Long) = new Path(s"$root/_committed/$id")
  private def batchDir(id: Long) = s"$root/data/batch=$id"

  def committed(spark: SparkSession, batchId: Long): Boolean =
    fs(spark).exists(marker(batchId))

  /** Write `df` as batch `batchId` unless that id already committed.
    * @return true if this call performed the write, false if skipped. */
  def append(df: DataFrame, batchId: Long): Boolean = {
    val spark = df.sparkSession
    if (committed(spark, batchId)) false
    else {
      df.write.mode("overwrite").parquet(batchDir(batchId))
      val f = fs(spark)
      f.mkdirs(marker(batchId).getParent)
      f.create(marker(batchId), true).close()
      true
    }
  }

  /** All rows of all committed batches (uncommitted partials excluded). */
  def read(spark: SparkSession): DataFrame = {
    val f = fs(spark)
    val mDir = new Path(s"$root/_committed")
    val ids =
      if (!f.exists(mDir)) Array.empty[Long]
      else f.listStatus(mDir).map(_.getPath.getName.toLong)
    if (ids.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.parquet(ids.sorted.map(batchDir): _*)
  }
}
