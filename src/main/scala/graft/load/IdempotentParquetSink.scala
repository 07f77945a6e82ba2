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
/** @param compactLayout optional physical-layout transform applied to
  *        the merged frame right before a compaction writes it (NEVER
  *        to per-batch appends or reads — correctness must not depend
  *        on it). The compaction is the one moment the whole dataset
  *        streams through a single write anyway, so clustering is free
  *        shuffle-wise: callers repartition/sortWithinPartitions here
  *        so parquet row-group min/max stats and dictionary filters
  *        can skip inside the compacted files ([[graft.operators.Bm25.DiskIndex]]
  *        clusters postings by term, impact-descending within term).
  */
final class IdempotentParquetSink(
    val root: String,
    val partitionColumns: Seq[String] = Nil,
    val compactLayout: DataFrame => DataFrame = identity) extends Serializable {

  /** Write with the sink's partition layout (every batch dir and every
    * compaction dir share it, so partition pruning works across the
    * whole union [[read]] assembles).
    */
  private def write(df: DataFrame, dir: String): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionColumns.nonEmpty) w.partitionBy(partitionColumns: _*) else w)
      .parquet(dir)
  }

  /** Multi-dir read. With a partition layout, each dir is its own
    * partitioned table root (Spark's partition inference rejects
    * several roots in one call), so dirs load separately and union —
    * partition filters still push into every child scan. Dirs holding
    * no data files are skipped FIRST: a partitioned write of an empty
    * batch emits only `_SUCCESS` (a normal foreachBatch occurrence),
    * and parquet schema inference fails on such a dir.
    */
  private def readDirs(spark: SparkSession, dirs: Seq[String]): DataFrame = {
    val f = fs(spark)
    val nonEmpty = dirs.filter(hasDataFiles(f, _))
    if (nonEmpty.isEmpty) spark.emptyDataFrame
    else if (partitionColumns.isEmpty) spark.read.parquet(nonEmpty: _*)
    else nonEmpty.map(spark.read.parquet(_)).reduce(_.unionByName(_))
  }

  /** True iff `dir` exists and contains at least one non-hidden file
    * (recursively — partition layouts nest data under key=value dirs).
    */
  private def hasDataFiles(f: org.apache.hadoop.fs.FileSystem,
                           dir: String): Boolean = {
    val p = new Path(dir)
    if (!f.exists(p)) return false
    val it = f.listFiles(p, true)
    while (it.hasNext) {
      val name = it.next().getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) return true
    }
    false
  }

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(id: Long) = new Path(s"$root/_committed/$id")
  private def batchDir(id: Long) = s"$root/data/batch=$id"
  private def compactDir(id: Long) = s"$root/compact/upto=$id"
  private def compactMarker(id: Long) = new Path(s"$root/_compacted/$id")

  /** Parse an entry name to a batch/watermark id; None for foreign
    * entries (stray files, checksum sidecars, temp dirs) — a marker
    * directory shared with ANY other writer must never crash the sink.
    */
  private def parseId(name: String, prefix: String): Option[Long] =
    scala.util.Try(name.stripPrefix(prefix).toLong).toOption

  private def listIds(spark: SparkSession, dir: String): Array[Long] = {
    val f = fs(spark)
    val p = new Path(s"$root/$dir")
    if (!f.exists(p)) Array.empty[Long]
    else f.listStatus(p).flatMap(st => parseId(st.getPath.getName, ""))
  }

  /** The highest compaction watermark: batches with id <= it live in
    * that compaction's single directory, not their own.
    */
  private def watermark(spark: SparkSession): Option[Long] = {
    val ws = listIds(spark, "_compacted")
    if (ws.isEmpty) None else Some(ws.max)
  }

  def committed(spark: SparkSession, batchId: Long): Boolean =
    fs(spark).exists(marker(batchId))

  /** The current compaction watermark, if any — batches at or below it
    * live in the compaction directory. Lets sinks built on top key
    * their own compaction-time artifacts to the same generation.
    */
  def compactionWatermark(spark: SparkSession): Option[Long] = watermark(spark)

  /** Rows of committed batches AFTER the compaction watermark only (the
    * "tail" an upper-layer artifact computed at compact() time has not
    * seen). Empty schemaless frame when there is no tail.
    */
  def readTail(spark: SparkSession): DataFrame = {
    val w = watermark(spark)
    val live = listIds(spark, "_committed")
      .filter(id => w.forall(id > _)).sorted.map(batchDir)
    if (live.isEmpty) spark.emptyDataFrame
    else readDirs(spark, live.toSeq)
  }

  /** Write `df` as batch `batchId` unless that id already committed.
    * @return true if this call performed the write, false if skipped. */
  def append(df: DataFrame, batchId: Long): Boolean = {
    val spark = df.sparkSession
    if (committed(spark, batchId)) false
    else {
      write(df, batchDir(batchId))
      val f = fs(spark)
      f.mkdirs(marker(batchId).getParent)
      f.create(marker(batchId), true).close()
      true
    }
  }

  /** All rows of all committed batches (uncommitted partials excluded):
    * the latest compaction's directory, if any, plus every batch
    * committed after its watermark.
    */
  def read(spark: SparkSession): DataFrame = {
    val w = watermark(spark)
    val live = listIds(spark, "_committed")
      .filter(id => w.forall(id > _)).sorted.map(batchDir)
    val dirs = w.map(compactDir).toSeq ++ live
    if (dirs.isEmpty) spark.emptyDataFrame
    else readDirs(spark, dirs)
  }

  /** Merge everything [[read]] currently sees into ONE directory — the
    * maintenance op for long-lived sinks (a years-old streaming index
    * otherwise accumulates one directory per micro-batch, and
    * object-store listing becomes the read bottleneck). Offline op:
    * don't run concurrently with appends.
    *
    * Crash-safe by ordering: the merged data lands in a NEW
    * `compact/upto=<maxId>` directory that stays invisible until its
    * `_compacted/<maxId>` watermark is created (a crash before the
    * marker changes nothing); only then are superseded data
    * directories deleted. Batch MARKERS are never deleted — a
    * re-delivered old batch id must keep skipping after its data moved
    * into the compaction.
    *
    * Cleanup sweeps by LISTING, not by the ids this call folded: every
    * `compact/upto=*` below the new watermark and every `data/batch=*`
    * at or below it is superseded, including dirs orphaned by a crash
    * between a previous compaction's marker creation and its deletes
    * (those would otherwise leak forever — the next watermark never
    * revisits them).
    *
    * @param force compact even when only ONE live directory exists (no
    *        merge win for the sink itself, but upper layers key
    *        compaction-generation artifacts to the watermark this
    *        advances — [[graft.operators.Bm25.DiskIndex]]). Never
    *        compacts with zero new committed batches.
    * @return true if a compaction ran, false if there was nothing to
    *         merge (zero or one live directory).
    */
  def compact(spark: SparkSession, force: Boolean = false): Boolean = {
    val f = fs(spark)
    val w = watermark(spark)
    def liveIds() = listIds(spark, "_committed")
      .filter(id => w.forall(id > _)).toSet
    var live = liveIds()
    if (live.isEmpty || (live.size + w.size <= 1 && !force)) return false
    // Fold-before-publish: an append that violates the offline contract
    // can land a marker for id <= upTo AFTER the merge read but BEFORE
    // the watermark create — once the watermark exists, read() filters
    // id <= watermark, so that batch's rows would turn silently
    // invisible while its marker makes the re-delivered append skip.
    // Re-list after each merge and fold newcomers until the committed
    // set is stable; the merged dir stays invisible until the marker
    // lands, so re-merging is free of reader-visible states. A marker
    // landing after the LAST re-list still loses that batch (the
    // residual race is unclosable without a filesystem lock) — which is
    // why concurrent append+compact stays out of contract; this loop
    // just shrinks the out-of-contract window from the whole merge
    // runtime to one list call.
    var upTo = live.max
    var merged = read(spark)
    var next = liveIds()
    while (next != live) {
      live = next
      upTo = live.max
      merged = read(spark)
      next = liveIds()
    }
    // all live dirs can legitimately be empty (0-row batches): advance
    // the watermark without a data dir — readers skip the missing
    // compaction dir via the hasDataFiles filter.
    if (merged.columns.nonEmpty) write(compactLayout(merged), compactDir(upTo))
    f.mkdirs(compactMarker(upTo).getParent)
    f.create(compactMarker(upTo), true).close()
    sweepSuperseded(spark, w, upTo)
    true
  }

  /** Delete every data directory superseded by watermark `upTo`:
    * compactions below it, plus batch dirs at or below it that are
    * either marker-COMMITTED (their rows live in the compaction now) or
    * strictly below the PREVIOUS watermark (long-superseded crash
    * partials — nothing can still be writing an id the stream has moved
    * past). An uncommitted dir in (prevW, upTo] is left alone: it may
    * be an in-flight append whose marker has not landed yet — deleting
    * its bytes would turn the eventual retry's skip into data loss.
    * (If that marker lands only AFTER compact()'s fold-before-publish
    * re-list, the preserved bytes are still unreadable — read() filters
    * id <= watermark — so leaving the dir protects the RETRY path, not
    * every later read; an append racing compact that far is out of the
    * offline-op contract, see [[compact]].) Listed from the
    * filesystem so crash-orphaned dirs from earlier compactions are
    * reclaimed too; entries that don't parse as ids are foreign and
    * never touched. Markers are never deleted.
    */
  private def sweepSuperseded(spark: SparkSession, prevW: Option[Long],
                              upTo: Long): Unit = {
    val f = fs(spark)
    val compactRoot = new Path(s"$root/compact")
    if (f.exists(compactRoot)) f.listStatus(compactRoot).foreach { st =>
      parseId(st.getPath.getName, "upto=").foreach { id =>
        if (id < upTo) f.delete(st.getPath, true)
      }
    }
    val dataRoot = new Path(s"$root/data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { st =>
      parseId(st.getPath.getName, "batch=").foreach { id =>
        if (id <= upTo &&
            (committed(spark, id) || prevW.exists(id < _)))
          f.delete(st.getPath, true)
      }
    }
  }
}
