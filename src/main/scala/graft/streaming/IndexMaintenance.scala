package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared log-structured-store maintenance for the band-partitioned
  * persistent near-dup indexes ([[StreamingDedup.LshIndex]] text,
  * [[StreamingVectorDedup.VectorBandIndex]] vector). Both indexes append
  * one file set per touched band per micro-batch, so a long-running
  * stream accumulates small files; compaction rewrites each band
  * partition as `filesPerBand` files sorted by bucket key (row-group
  * min/max then prunes probes within a band), atomically via
  * write-new / swap / delete-old. Run offline with batches paused —
  * single-writer maintenance, like any log-structured store.
  *
  * Crash windows (all recovered by the NEXT compact call, and none makes
  * the live index unreadable except the torn swap, which recovery rolls
  * back before anything else runs):
  *  - crash during/after write-new (`<dir>__compacting` leftover): the
  *    live index was never touched; the remnant is deleted on entry.
  *  - crash between the two renames (`<dir>` missing, `<dir>__old`
  *    holding the data): the swap is rolled back on entry — without
  *    this, `indexExists` reads false and the corpus registry silently
  *    vanishes from its path.
  *  - crash after swap-in but before ledger move / delete-old
  *    (`<dir>__old` leftover beside a healthy index): the batch-id
  *    ledger is rescued if it never moved, then the remnant is deleted.
  */
private[streaming] object IndexMaintenance {

  /** True iff `dir` holds at least one actual `band=` partition — a dir
    * with only bookkeeping files (`_SUCCESS`, `_batches`) would make
    * `spark.read.parquet` fail with "unable to infer schema".
    */
  def indexExists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("band="))
  }

  /** Compact the index at `dir` to `bands * filesPerBand` files, each
    * band partition sorted by `sortCol`, scrubbing duplicate (id, band)
    * rows left by the at-least-once append/marker crash window (banding
    * is deterministic per doc, so equal (id, band) implies an identical
    * row). Safe to call on a dir left torn by a previous crashed
    * compact — see the recovery contract in the object Scaladoc.
    */
  def compact(spark: SparkSession, dir: String, bands: Int,
              filesPerBand: Int, sortCol: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "__compacting")
    val old = new Path(dir + "__old")
    recover(fs, p, tmp, old)
    if (!indexExists(spark, dir)) return
    spark.read.parquet(dir)
      .dropDuplicates("id", "band")
      .repartition(bands * filesPerBand, col("band"),
        pmod(xxhash64(col("id")), lit(filesPerBand)))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").partitionBy("band").parquet(tmp.toString)
    if (!fs.rename(p, old)) sys.error(s"compact: cannot move $p aside")
    if (!fs.rename(tmp, p)) { fs.rename(old, p); sys.error(s"compact: cannot swap $tmp in") }
    // carry the batch-id ledger across the swap (retry markers survive)
    val oldMarkers = new Path(old, "_batches")
    if (fs.exists(oldMarkers))
      fs.rename(oldMarkers, new Path(p, "_batches"))
    fs.delete(old, true)
  }

  /** Roll back / clean up whatever a previously crashed compact left. */
  private def recover(fs: FileSystem, p: Path, tmp: Path, old: Path): Unit = {
    if (!fs.exists(p) && fs.exists(old)) {
      // torn swap: the index was moved aside but the new files never
      // renamed in — restore it before anything reads `p`.
      if (!fs.rename(old, p)) sys.error(s"compact: cannot restore $old to $p")
    } else if (fs.exists(p) && fs.exists(old)) {
      // swap completed but cleanup didn't: rescue the ledger if it never
      // moved (losing it only re-appends on re-delivery, but rescuing is
      // free), then drop the remnant.
      val om = new Path(old, "_batches")
      val pm = new Path(p, "_batches")
      if (fs.exists(om) && !fs.exists(pm)) fs.rename(om, pm)
      fs.delete(old, true)
    }
    fs.delete(tmp, true) // stale write-new remnant; rewritten anyway
  }
}
