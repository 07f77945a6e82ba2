package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk pass that turns a document
  * corpus into fixed-length training examples (the GPT-style data layout:
  * concatenate all documents in a deterministic order, slice the token
  * stream into `capacity`-token chunks). The per-document answer is its
  * span [start_token, end_token) in the concatenated stream and the chunk
  * its first token lands in.
  *
  * The core is a DISTRIBUTED PREFIX SUM. The naive formulation — a global
  * window `sum(len) over (order by id)` — plans as a single-partition
  * window: one executor sorts the corpus. Here:
  *
  *   1. range-repartition by the order key (partition p holds an id range
  *      strictly below partition p+1's),
  *   2. pin each row's partition index as DATA (`spark_partition_id` —
  *      evaluated before any further exchange can move rows),
  *   3. per-partition subtotals collect to the driver — #partitions longs,
  *      metadata at any scale — and prefix into per-partition offsets,
  *   4. the within-partition running sum is a window PARTITIONED by the
  *      pinned index (bounded work per partition), plus the broadcast
  *      offset.
  *
  * Identical arithmetic to the global window (spec + oracle-checked),
  * shuffle cost of one range exchange + one hash exchange.
  */
object Packing {

  /** Adds `start_token` (tokens strictly before this row in id order). */
  def withPrefixSum(df: DataFrame, idCol: String, lenCol: String): DataFrame = {
    val spark = df.sparkSession
    // PERSISTED: the frame is executed twice (the subtotal collect below,
    // then the output job), and RangePartitioner SAMPLES its bounds with
    // an RDD-id-dependent seed — two independent executions could place
    // boundary rows in different partitions, silently corrupting offsets.
    // The persist pins one placement for both consumers; the release
    // listener frees it after the consuming action.
    val parts = df
      .repartitionByRange(col(s"`$idCol`"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = parts.groupBy("__pid")
      .agg(sum(col(s"`$lenCol`")).as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // registered AFTER the eager subtotal collect
    graft.core.Frames.releaseAfterNextAction(spark, parts)
    val offsets = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__offset")
    val w = Window.partitionBy("__pid").orderBy(col(s"`$idCol`"))
      .rowsBetween(Window.unboundedPreceding, -1)
    parts
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn("start_token",
        col("__offset") + coalesce(sum(col(s"`$lenCol`")).over(w), lit(0L)))
      .drop("__pid", "__offset")
  }

  /** Per-document packing assignment: span in the concatenated stream and
    * the `capacity`-token chunk holding its first token. Documents may
    * straddle chunk boundaries (concat-and-chunk semantics — the layout
    * never pads).
    */
  def packChunks(df: DataFrame, idCol: String, lenCol: String,
                 capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    withPrefixSum(df, idCol, lenCol)
      .select(col(s"`$idCol`"),
        col(s"`$lenCol`").cast("long").as("n_tokens"),
        col("start_token"),
        (col("start_token") + col(s"`$lenCol`")).as("end_token"),
        (col("start_token") / capacity).cast("long").as("chunk_id"),
        pmod(col("start_token"), lit(capacity)).as("offset_in_chunk"))
  }
}
