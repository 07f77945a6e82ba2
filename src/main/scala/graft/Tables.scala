package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loader for the driver-provided benchmark tables (TESTDATA.md).
  * One parquet file per table under `<sfDir>/<name>.parquet`.
  *
  * The `events` table stores TIMESTAMP(NANOS) which Spark 4 rejects; sessions
  * set `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions.config]])
  * and this loader converts the resulting long back to a microsecond
  * timestamp (the data has no sub-microsecond content, verified at gen time).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
    else if (name == "events" && df.schema("ts").dataType == TimestampNTZType)
      // Parquet files written with isAdjustedToUTC=0 surface as TIMESTAMP_NTZ;
      // the session TZ is pinned to UTC, so this cast is value-identical to
      // the oracle's naive reading while restoring TIMESTAMP semantics
      // (unix_micros etc. reject NTZ).
      df.withColumn("ts", col("ts").cast("timestamp"))
    else df
  }
}

/** Shared session tuning for every entry point (Verify, Bench, tests). */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")

  /** Register the engine's native SQL functions (hms_to_deg, dms_to_deg,
    * vec_dot) on a freshly built session. Every entry point calls this.
    */
  def init(spark: SparkSession): SparkSession = {
    graft.functions.CoordExpressions.register(spark)
    graft.functions.VectorExpressions.register(spark)
    graft.functions.NGramGenerator.register(spark)
    graft.functions.SketchExpressions.register(spark)
    graft.functions.TextMetricsExpr.register(spark)
    spark.experimental.extraStrategies = Seq(graft.plans.AsOfJoinStrategy)
    spark
  }
}
