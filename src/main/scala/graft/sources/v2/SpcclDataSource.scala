package graft.sources.v2

import java.util
import scala.collection.mutable.ArrayBuffer
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.meertrap.Schemas

/** SPCCL as a native DataSourceV2 — the source-side extension idiom
  * (`TableProvider` + `ScanBuilder` + `PartitionReader`), complementing the
  * expression/aggregator/generator/whole-plan idioms elsewhere
  * (SURVEY §2.11). The V1 composition (`graft.sources.SpcclSource`) stays
  * the pipeline's source because it also emits the quarantine frame; this
  * provider demonstrates what a production V2 connector buys at scale:
  *
  *   - COLUMN PRUNING reaches the PARSER ([[SupportsPushDownRequiredColumns]]):
  *     a `select(snr)` parses one field per line instead of 13 — on a
  *     100 TB candidate archive that is the difference between I/O-bound
  *     and parse-bound,
  *   - FILTER PUSHDOWN into the reader ([[SupportsPushDownFilters]]):
  *     numeric predicates (snr > x, dm ranges, beam =) drop rows during
  *     the scan, before they ever become InternalRows,
  *   - file-granular [[InputPartition]]s bin-packed to a target group size
  *     — many small files per task, the layout MeerTRAP actually has
  *     (one TSV per candidate directory).
  *
  * Usage: `spark.read.format("graft.sources.v2.SpcclDataSource")
  *   .load(dir)` — same single-line-per-file semantics as V1 (multi-line
  *   files are skipped; the reference fails them, `extract.py:40-42`).
  */
class SpcclDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpcclV2.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SpcclTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object SpcclV2 {
  /** V1 schema minus the positional `index` column, plus the derived
    * `filename` (V1 drops `index` after parsing too).
    */
  val fullSchema: StructType = StructType(
    StructField("filename", StringType) +:
      Schemas.spccl.fields.toSeq.filterNot(_.name == "index"))

  /** Raw TSV position of each schema field (index occupies position 0). */
  val tsvPos: Map[String, Int] =
    Schemas.spccl.fields.zipWithIndex.map { case (f, i) => f.name -> i }.toMap

  /** Hadoop convention: `_`/`.`-prefixed path segments are metadata, not
    * data — skipping them keeps scans blind to the writer's `_temporary`
    * staging and `_quarantine` rejects.
    */
  def isHidden(p: Path): Boolean = {
    var cur = p
    while (cur != null) {
      val n = cur.getName
      if (n.startsWith("_") || n.startsWith(".")) return true
      cur = cur.getParent
    }
    false
  }
}

final class SpcclTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "path option is required")
  override def name(): String = s"spccl($path)"
  override def schema(): StructType = SpcclV2.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SpcclScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SpcclWriteBuilder(path, info.schema())
}

final class SpcclScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = SpcclV2.fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Comparison/null filters on scalar columns evaluate inside the reader;
    * anything else stays a Spark-side residual. Pushed filters are ALSO
    * returned as residuals (cheap re-check, standard for V2 file sources —
    * correctness never depends on the reader's evaluation).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(SpcclFilters.supported)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SpcclScan(path, required, pushed)
}

final class SpcclScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SpcclScan path=$path, ReadSchema: ${required.simpleString}, " +
      s"PushedFilters: [${pushed.mkString(", ")}]"

  /** Driver-side file listing, bin-packed into partitions of up to
    * `filesPerPartition` files (candidate archives are many tiny files —
    * one task per file would be scheduler-bound).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = ArrayBuffer.empty[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.contains("spccl") && !SpcclV2.isHidden(f.getPath))
        files += f.getPath.toString
    }
    val filesPerPartition = 64
    files.sorted.grouped(filesPerPartition)
      .map(g => SpcclInputPartition(g.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // Hadoop Configuration is not serializable — ship the entries and
    // rebuild executor-side (what SerializableConfiguration does inside
    // Spark, which is private[spark]).
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val entries = {
      val it = hconf.iterator()
      val b = ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.toArray
    }
    new SpcclReaderFactory(required.fieldNames, pushed, entries)
  }

  override def toMicroBatchStream(checkpointLocation: String) =
    new SpcclMicroBatchStream(path, required, pushed)
}

/** Micro-batch streaming over the candidate archive: the offset is the
  * COUNT of files in the lexicographically-sorted listing processed so
  * far, so each batch reads exactly the files that appeared since the last
  * one. Contract: the archive is append-only and file paths sort after
  * already-processed ones — true for MeerTRAP candidate dirs, which embed
  * a unix timestamp (`<host>_<unixts>/...`). (Spark's built-in file source
  * keeps a seen-files log instead; the sorted high-watermark trades that
  * unbounded state for the monotonic-naming contract.)
  *
  * The contract is VALIDATED, not assumed: the offset also records the
  * last processed path, and partition planning fails loudly if the
  * re-listed archive disagrees (a deletion, rename, or non-monotonic new
  * name would otherwise silently skip or double-read files — corrupting
  * exactly-once with no error).
  */
final class SpcclMicroBatchStream(path: String, required: StructType,
                                  pushed: Array[Filter])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class FileCountOffset(n: Long, last: String) extends Offset {
    override def json(): String = {
      import org.json4s.JsonDSL._
      org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(("n" -> n) ~ ("last" -> last)))
    }
  }

  private def listSorted(): Array[String] = {
    val spark = SparkSession.active
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = ArrayBuffer.empty[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.contains("spccl") && !SpcclV2.isHidden(f.getPath))
        files += f.getPath.toString
    }
    files.sorted.toArray
  }

  // Listing snapshot per latestOffset() call; partitions planned from a
  // fresh sorted listing sliced by [start, end) — stable under the
  // (validated) monotonic-naming contract.
  override def initialOffset(): Offset = FileCountOffset(0L, "")
  override def latestOffset(): Offset = {
    val files = listSorted()
    FileCountOffset(files.length.toLong, files.lastOption.getOrElse(""))
  }
  override def deserializeOffset(json: String): Offset = {
    // Legacy bare-count offsets (pre-validation checkpoints) deserialize
    // with no last-path pin; validation resumes from the next commit.
    if (!json.trim.startsWith("{")) FileCountOffset(json.trim.toLong, "")
    else {
      val j = org.json4s.jackson.JsonMethods.parse(json)
      implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
      FileCountOffset((j \ "n").extract[Long], (j \ "last").extract[String])
    }
  }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val st = start.asInstanceOf[FileCountOffset]
    val en = end.asInstanceOf[FileCountOffset]
    val all = listSorted()
    // Cheap contract check: the file AT position start.n-1 must still be
    // the recorded last-processed path. Any deletion, rename, or new name
    // sorting before the watermark shifts that position and fails here
    // instead of silently double-reading or skipping.
    if (st.n > 0 && st.last.nonEmpty) {
      if (all.length < st.n)
        throw new IllegalStateException(
          s"SPCCL archive shrank below the committed offset (${all.length} < ${st.n}): " +
            "files were deleted or renamed under an append-only stream")
      val atWatermark = all(st.n.toInt - 1)
      if (atWatermark != st.last)
        throw new IllegalStateException(
          "SPCCL archive violated the append-only monotonic-naming contract: " +
            s"offset pinned last=${st.last} at position ${st.n - 1}, but the listing now has " +
            s"$atWatermark there. Files were deleted/renamed, or new names do not sort " +
            "after processed ones; the count offset can no longer be trusted.")
    }
    val slice = all.slice(st.n.toInt, en.n.toInt)
    slice.grouped(64).map(g => SpcclInputPartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val entries = {
      val it = hconf.iterator()
      val b = ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.toArray
    }
    new SpcclReaderFactory(required.fieldNames, pushed, entries)
  }
}

final case class SpcclInputPartition(files: Array[String]) extends InputPartition

final class SpcclReaderFactory(columns: Array[String], pushed: Array[Filter],
                               confEntries: Array[(String, String)])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SpcclPartitionReader(partition.asInstanceOf[SpcclInputPartition].files,
      columns, pushed, confEntries)
}

/** Executor-side reader: one file = one candidate line. Parses ONLY the
  * TSV fields the pruned schema needs, evaluates pushed filters on the
  * typed values, skips files that are not exactly one line.
  */
final class SpcclPartitionReader(files: Array[String], columns: Array[String],
                                 pushed: Array[Filter],
                                 confEntries: Array[(String, String)])
    extends PartitionReader[InternalRow] {

  private var i = 0
  private var current: InternalRow = _
  private lazy val fs: Path => FileSystem = {
    val hconf = new org.apache.hadoop.conf.Configuration(false)
    confEntries.foreach { case (k, v) => hconf.set(k, v) }
    p => p.getFileSystem(hconf)
  }

  override def next(): Boolean = {
    current = null
    while (current == null && i < files.length) {
      current = readOne(files(i))
      i += 1
    }
    current != null
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()

  private def readOne(file: String): InternalRow = {
    val p = new Path(file)
    val in = fs(p).open(p)
    val content =
      try {
        val out = new java.io.ByteArrayOutputStream()
        in.transferTo(out)
        out.toString("UTF-8")
      } finally in.close()
    // \r?\n: CRLF archives must not leave \r glued to the last cell.
    val lines = content.split("\r?\n").filter(_.nonEmpty)
    if (lines.length != 1) return null        // reference: 1 line per file
    val cells = lines(0).split("\t", -1)

    val candDir = p.getParent.getName
    val stem = p.getName.replaceAll("\\.[^.]*$", "")

    def cell(name: String): String = {
      val pos = SpcclV2.tsvPos(name)
      if (pos < cells.length && cells(pos).nonEmpty) cells(pos) else null
    }
    def typed(name: String): Any = name match {
      case "filename" => s"$candDir/$stem"
      case "fil_file" | "plot_file" =>
        Option(cell(name)).map(v => s"$candDir/$v").orNull
      case n =>
        val raw = cell(n)
        if (raw == null) null
        else
          // PERMISSIVE parity with the V1 CSV read: a malformed numeric
          // cell nulls that VALUE; it must not fail the whole scan (or the
          // micro-batch stream it feeds).
          try SpcclV2.fullSchema(n).dataType match {
            case DoubleType  => raw.toDouble
            case IntegerType => raw.toInt
            case LongType    => raw.toLong
            case _           => raw
          } catch { case _: NumberFormatException => null }
    }

    if (!pushed.forall(f => SpcclFilters.eval(f, typed))) return null

    new GenericInternalRow(columns.map { c =>
      typed(c) match {
        case s: String => UTF8String.fromString(s)
        case other     => other
      }
    })
  }
}

/** Write side of the connector: each row becomes one single-line TSV file
  * named by its `filename` column — the archive's real layout (one SPCCL
  * file per candidate), so a written directory is immediately readable by
  * this same source, V1, and the reference's parser.
  *
  * Commit protocol: executors write every file under
  * `_temporary/<writeId>/...` (hidden from scans) and report
  * (temp, final) pairs; the driver renames on job commit and deletes the
  * staging tree on abort — a failed/speculative task can never surface
  * half-written archive files.
  *
  * QUARANTINE contract (the write-side mirror of the read-side single-line
  * rule): a row whose string cells embed `\t`/`\n`/`\r` would corrupt the
  * one-line TSV format, so it is committed under `_quarantine/` (readable
  * for inspection, invisible to scans) instead of failing the job or
  * silently writing a malformed archive file.
  *
  * Streaming: the same factory serves `writeStream` epochs; re-delivered
  * epochs rename onto the SAME final names (filename-keyed), so retries
  * are idempotent.
  */
final class SpcclWriteBuilder(path: String, schema: StructType) extends WriteBuilder {
  override def build(): Write = new SpcclWrite(path, schema)
}

final class SpcclWrite(path: String, schema: StructType) extends Write {
  private def confEntries: Array[(String, String)] = {
    val hconf = SparkSession.active.sessionState.newHadoopConf()
    val it = hconf.iterator()
    val b = ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.toArray
  }

  override def toBatch: BatchWrite = new SpcclBatchWrite(path, schema, confEntries)
  override def toStreaming: StreamingWrite = new SpcclStreamingWrite(path, schema, confEntries)
}

final case class SpcclCommit(pairs: Array[(String, String)]) extends WriterCommitMessage

final class SpcclBatchWrite(path: String, schema: StructType,
                            confEntries: Array[(String, String)]) extends BatchWrite {
  private val writeId = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SpcclWriterFactory(path, schema, confEntries, writeId)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    SpcclWriteCommit.commit(path, writeId, messages, confEntries)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    SpcclWriteCommit.abort(path, writeId, confEntries)
}

final class SpcclStreamingWrite(path: String, schema: StructType,
                                confEntries: Array[(String, String)]) extends StreamingWrite {
  // Epoch-scoped staging: a retried epoch restages and renames onto the
  // same filename-derived final paths (idempotent overwrite).
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new SpcclWriterFactory(path, schema, confEntries, "epoch")
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    SpcclWriteCommit.commit(path, s"epoch-$epochId", messages, confEntries)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    SpcclWriteCommit.abort(path, s"epoch-$epochId", confEntries)
}

object SpcclWriteCommit {
  private def fs(path: String, confEntries: Array[(String, String)]): FileSystem = {
    val hconf = new org.apache.hadoop.conf.Configuration(false)
    confEntries.foreach { case (k, v) => hconf.set(k, v) }
    new Path(path).getFileSystem(hconf)
  }

  def commit(path: String, writeId: String, messages: Array[WriterCommitMessage],
             confEntries: Array[(String, String)]): Unit = {
    val f = fs(path, confEntries)
    // The exists/delete below makes RE-DELIVERED epochs idempotent, but it
    // would also silently keep only the last writer when two rows in the
    // SAME batch map to one final path (duplicate `filename` keys) —
    // undetected data loss. All commit messages are on the driver, so
    // detect intra-batch collisions up front and fail the job instead.
    val finals = messages.flatMap { case SpcclCommit(pairs) => pairs.map(_._2) }
    val dups = finals.groupBy(identity).filter(_._2.length > 1).keys
    if (dups.nonEmpty) {
      abort(path, writeId, confEntries)
      sys.error("spccl write commit: multiple rows in one batch map to the " +
        s"same output file (duplicate filename keys): ${dups.take(5).mkString(", ")}")
    }
    messages.foreach { case SpcclCommit(pairs) =>
      pairs.foreach { case (tmp, fin) =>
        val finPath = new Path(fin)
        f.mkdirs(finPath.getParent)
        if (f.exists(finPath)) f.delete(finPath, false)   // idempotent re-delivery
        if (!f.rename(new Path(tmp), finPath))
          sys.error(s"spccl write commit: cannot rename $tmp -> $fin")
      }
    }
    f.delete(new Path(path, s"_temporary/$writeId"), true)
  }

  def abort(path: String, writeId: String, confEntries: Array[(String, String)]): Unit =
    fs(path, confEntries).delete(new Path(path, s"_temporary/$writeId"), true)
}

final class SpcclWriterFactory(path: String, schema: StructType,
                               confEntries: Array[(String, String)], writeId: String)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new SpcclDataWriter(path, schema, confEntries, writeId, partitionId, taskId)
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new SpcclDataWriter(path, schema, confEntries, s"epoch-$epochId", partitionId, taskId)
}

final class SpcclDataWriter(root: String, schema: StructType,
                            confEntries: Array[(String, String)],
                            writeId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val fs: FileSystem = {
    val hconf = new org.apache.hadoop.conf.Configuration(false)
    confEntries.foreach { case (k, v) => hconf.set(k, v) }
    new Path(root).getFileSystem(hconf)
  }
  private val pairs = ArrayBuffer.empty[(String, String)]
  private var seq = 0

  private val fieldIdx: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap

  private def cellOf(row: InternalRow, name: String): String =
    fieldIdx.get(name) match {
      case None => ""
      case Some(i) if row.isNullAt(i) => ""
      case Some(i) => SpcclV2.fullSchema(name).dataType match {
        case StringType  => row.getUTF8String(i).toString
        case DoubleType  => row.getDouble(i).toString
        case IntegerType => row.getInt(i).toString
        case LongType    => row.getLong(i).toString
        case t           => sys.error(s"unsupported spccl write type $t")
      }
    }

  override def write(row: InternalRow): Unit = {
    val filename = cellOf(row, "filename") match {
      case "" => s"unnamed/${partitionId}_${taskId}_$seq"
      case f  => f
    }
    val candDir = filename.split('/').head
    // On read, fil_file/plot_file were prefixed with the candidate dir —
    // strip it again so a round-tripped file equals the original cell.
    def unprefixed(n: String): String = {
      val v = cellOf(row, n)
      if (v.startsWith(s"$candDir/")) v.stripPrefix(s"$candDir/") else v
    }
    val cells = Schemas.spccl.fields.map(_.name).map {
      case "index"                  => "1"   // positional; V2 drops it on read
      case n @ ("fil_file" | "plot_file") => unprefixed(n)
      case n                        => cellOf(row, n)
    }
    val dirty = cells.exists(c => c.exists(ch => ch == '\t' || ch == '\n' || ch == '\r'))
    val line = cells.mkString("\t") + "\n"
    // Canonical archive naming: the reader's filename column is the path
    // with ONE extension stripped, so `<base>.spccl` names round-trip
    // exactly as `<base>.spccl.log`; other names are canonicalized by
    // appending `.spccl` (the listing filter requires it).
    val rel = if (filename.endsWith(".spccl")) s"$filename.log"
              else s"$filename.spccl.log"
    val fin =
      if (dirty) new Path(root, s"_quarantine/$rel")
      else new Path(root, rel)
    val tmp = new Path(root, s"_temporary/$writeId/$partitionId-$taskId/$seq")
    seq += 1
    fs.mkdirs(tmp.getParent)
    val out = fs.create(tmp, true)
    try out.write(line.getBytes("UTF-8")) finally out.close()
    pairs += tmp.toString -> fin.toString
  }

  override def commit(): WriterCommitMessage = SpcclCommit(pairs.toArray)
  override def abort(): Unit =
    pairs.foreach { case (tmp, _) =>
      try fs.delete(new Path(tmp), false) catch { case _: Exception => () }
    }
  override def close(): Unit = ()
}

/** Pushed-filter evaluation over typed column accessors. */
object SpcclFilters {
  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
         _: LessThan | _: LessThanOrEqual | _: IsNotNull | _: IsNull => true
    case And(l, r) => supported(l) && supported(r)
    case _ => false
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    case (x: Double, y: Number) => Some(java.lang.Double.compare(x, y.doubleValue()))
    case (x: Int, y: Number)    => Some(java.lang.Double.compare(x.toDouble, y.doubleValue()))
    case (x: Long, y: Number)   => Some(java.lang.Double.compare(x.toDouble, y.doubleValue()))
    case (x: String, y: String) => Some(x.compareTo(y))
    case _ => None
  }

  def eval(f: Filter, col: String => Any): Boolean = f match {
    case EqualTo(a, v)            => cmp(col(a), v).contains(0)
    case GreaterThan(a, v)        => cmp(col(a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(col(a), v).exists(_ >= 0)
    case LessThan(a, v)           => cmp(col(a), v).exists(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(col(a), v).exists(_ <= 0)
    case IsNotNull(a)             => col(a) != null
    case IsNull(a)                => col(a) == null
    case And(l, r)                => eval(l, col) && eval(r, col)
    case _                        => true
  }
}
