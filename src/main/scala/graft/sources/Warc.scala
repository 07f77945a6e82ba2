package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record source — the container format
  * every web-crawl corpus (Common Crawl and descendants) arrives in, and
  * the natural ingest boundary for the URL/domain family
  * ([[graft.functions.UrlFns]], [[graft.operators.Domains]]).
  *
  * A WARC file is a concatenation of records, each a `WARC/1.0` version
  * line + CRLF header block + empty line + `Content-Length` payload
  * bytes + CRLF CRLF. The LOAD-BEARING property: payloads are opaque
  * bytes framed by `Content-Length` alone — a payload may itself contain
  * `WARC/1.0` lines, CRLF runs, or anything else, so any delimiter/regex
  * splitter is wrong by construction. This parser walks bytes: header
  * block scanned to its CRLF CRLF terminator (bounded), payload skipped
  * by length, trailer checked. Malformed framing (no terminator, bad or
  * missing Content-Length, truncated payload or trailer) quarantines the
  * record — emitted with `valid = false` and an `error` reason, the
  * per-record analogue of the reference's per-file fault tolerance
  * (ska-src-maltopuft-etl `parse.py`: one bad input never aborts the
  * batch) — and the scan resyncs at the next `WARC/` magic, so one
  * corrupt record costs itself, not the file.
  *
  * Scale shape: parsing is per-file imperative byte-walking — the
  * justified `flatMap` kernel (codec-style work, the `Multimodal`
  * argument); everything downstream is columns. Files parallelize across
  * the executor grid via `binaryFile`; a 100 TB crawl is millions of
  * ~1 GB WARC files, which is exactly Spark's happy path (one task per
  * file, no shuffle until the caller aggregates).
  */
object Warc {

  /** One parsed record. `offset` is the byte offset of the record's
    * version line within its file; invalid records carry the failure in
    * `error` and whatever header fields were recovered.
    */
  final case class WarcRecord(
      offset: Long,
      valid: Boolean,
      error: String,
      warc_type: String,
      record_id: String,
      target_uri: String,
      content_length: Long,
      payload: Array[Byte])

  private val Magic = "WARC/".getBytes(UTF_8)
  private val CrlfCrlf = "\r\n\r\n".getBytes(UTF_8)
  /** Header blocks are small by spec practice; a missing CRLF CRLF must
    * not scan gigabytes of payload looking for one.
    */
  private val MaxHeaderBytes = 64 * 1024

  private def byteIndexOf(hay: Array[Byte], needle: Array[Byte], from: Int,
                      until: Int = Int.MaxValue): Int = {
    var i = math.max(from, 0)
    val last = math.min(hay.length, until) - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Parse every record in a WARC blob, lazily — one record held at a
    * time beyond the input buffer itself. Bytes before the first magic
    * and between records (broken trailers, garbage) are skipped by
    * resyncing on the magic; framing failures quarantine one record
    * each.
    */
  def parseIterator(bytes: Array[Byte]): Iterator[WarcRecord] =
    new scala.collection.AbstractIterator[WarcRecord] {
      // NB: byteIndexOf, not bare indexOf — Iterator inherits its own
      // indexOf(elem, from), which would consume THIS iterator
      private var pos = byteIndexOf(bytes, Magic, 0)
      override def hasNext: Boolean = pos >= 0
      override def next(): WarcRecord = {
        val (rec, nxt) = parseOne(bytes, pos)
        pos = if (nxt > pos) byteIndexOf(bytes, Magic, nxt) else -1
        rec
      }
    }

  /** [[parseIterator]], materialized (fixtures and small blobs). */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = parseIterator(bytes).toSeq

  /** Parse the record whose version line starts at `pos`; returns the
    * record and the offset to resume scanning from.
    */
  private def parseOne(bytes: Array[Byte], pos: Int): (WarcRecord, Int) = {
    def invalid(err: String, tpe: String = "", id: String = "", uri: String = "",
                cl: Long = -1L) =
      WarcRecord(pos.toLong, valid = false, err, tpe, id, uri, cl, Array.emptyByteArray)
    val hdrLimit = math.min(bytes.length, pos + MaxHeaderBytes)
    // bounded in-place scan — no per-record copy of the header window
    val hdrEnd = byteIndexOf(bytes, CrlfCrlf, pos, hdrLimit)
    if (hdrEnd < 0)
      return (invalid("no CRLF CRLF header terminator"), pos + Magic.length)
    val headerText = new String(bytes, pos, hdrEnd - pos, UTF_8)
    val lines = headerText.split("\r\n", -1)
    if (!lines.head.startsWith("WARC/"))
      return (invalid("version line is not WARC/x.y"), pos + Magic.length)
    val fields = lines.tail.flatMap { l =>
      val i = l.indexOf(':')
      if (i <= 0) None else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    val tpe = fields.getOrElse("warc-type", "")
    val id = fields.getOrElse("warc-record-id", "")
    val uri = fields.getOrElse("warc-target-uri", "")
    val cl = fields.get("content-length") match {
      case Some(s) if s.nonEmpty && s.forall(_.isDigit) => s.toLong
      case _ =>
        return (invalid("missing or non-numeric Content-Length", tpe, id, uri),
          pos + Magic.length)
    }
    val payloadStart = hdrEnd + 4
    val payloadEnd = payloadStart + cl
    if (payloadEnd > bytes.length)
      return (invalid(s"truncated payload: need $cl bytes, " +
        s"${bytes.length - payloadStart} remain", tpe, id, uri, cl),
        bytes.length)
    val trailerOk = payloadEnd + 4 <= bytes.length &&
      bytes(payloadEnd.toInt) == '\r' && bytes(payloadEnd.toInt + 1) == '\n' &&
      bytes(payloadEnd.toInt + 2) == '\r' && bytes(payloadEnd.toInt + 3) == '\n'
    val payload = java.util.Arrays.copyOfRange(bytes, payloadStart.toInt, payloadEnd.toInt)
    if (!trailerOk && payloadEnd != bytes.length)
      // payload framed fine but the record separator is broken — keep the
      // record (the bytes are unambiguous), resync on the magic
      (WarcRecord(pos.toLong, valid = true, "missing CRLF CRLF trailer",
        tpe, id, uri, cl, payload), payloadEnd.toInt)
    else
      (WarcRecord(pos.toLong, valid = true, "", tpe, id, uri, cl, payload),
        math.min(payloadEnd + 4, bytes.length).toInt)
  }

  /** Render one record — the writer half of the round trip (specs, test
    * corpora, re-sharding a parsed crawl back out).
    */
  def render(warcType: String, recordId: String, targetUri: String,
             payload: Array[Byte]): Array[Byte] = {
    val header = s"WARC/1.0\r\nWARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: $recordId\r\nWARC-Target-URI: $targetUri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    header.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  /** Explode a (`path`, `content`) frame of WARC blobs into one row per
    * record: (path, offset, valid, error, warc_type, record_id,
    * target_uri, content_length, payload).
    */
  def records(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val typed: Dataset[(String, Array[Byte])] =
      files.select(col("path").cast("string"), col("content"))
        .as[(String, Array[Byte])]
    typed.flatMap { case (path, bytes) =>
      parseIterator(if (bytes == null) Array.emptyByteArray else bytes)
        .map(r => (path, r.offset, r.valid, r.error, r.warc_type,
          r.record_id, r.target_uri, r.content_length, r.payload))
    }.toDF("path", "offset", "valid", "error", "warc_type", "record_id",
      "target_uri", "content_length", "payload")
  }

  /** Read every WARC file under `path` (glob) — `binaryFile` scan (one
    * task per file) + [[records]].
    */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    records(spark.read.format("binaryFile").load(path))

  private val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))

  /** STREAMING ingest: the crawl-drain path — WARC files land
    * continuously, each micro-batch parses only the newly arrived files
    * (the file-stream source checkpoints processed paths, so a restart
    * never re-parses history), and the record frame composes with the
    * stateless URL/domain family and the streaming dedup indexes
    * downstream. Drive with `Trigger.AvailableNow` +
    * `maxFilesPerTrigger` for continuous compaction (SCALE §1/§8
    * posture); parsing itself is the same per-file kernel as the batch
    * path — stateless, so exactly-once reduces to the source's
    * file-tracking plus an idempotent sink.
    */
  def readStream(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    records(spark.readStream.format("binaryFile")
      .schema(binaryFileSchema).load(path))
}
