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
  /** gzip magic + CM=deflate — the resync needle after a corrupt member. */
  private val GzMagic = Array(0x1f.toByte, 0x8b.toByte, 0x08.toByte)
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

  /** Does this blob start as a gzip stream? */
  def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 0x1f.toByte && bytes(1) == 0x8b.toByte

  /** Raw or gzipped, auto-detected — the per-file kernel [[records]]
    * runs. Gzipped input covers BOTH on-disk conventions: Common Crawl's
    * member-per-record `.warc.gz` (one gzip member per WARC record,
    * members concatenated) and a whole-file gzip (one member). Members
    * decompress independently with the same quarantine contract as the
    * record parser: a corrupt member (bad header, deflate error, CRC or
    * ISIZE mismatch, truncation) emits ONE invalid record carrying the
    * member's COMPRESSED byte offset and the failure reason, and the
    * scan resyncs at the next gzip magic — so one bad member costs
    * itself, never the file. Successful members' output is parsed as one
    * concatenated WARC stream (identical to what a streaming gunzip
    * yields), so records spanning members — legal, if against the spec's
    * recommendation — still frame correctly; their `offset` is the
    * DECOMPRESSED stream offset. Memory posture: the decompressed file
    * is buffered (~3–5× the compressed blob binaryFile already holds) —
    * see SCALE.md's WARC section.
    */
  /** Decompressed-output ceiling per file: just under the JVM array
    * bound the downstream parser needs anyway. Real crawl files sit far
    * below it; a decompression bomb (or a pathological multi-GB member)
    * hits the cap and QUARANTINES instead of driving the task into OOM
    * — the same cost-one-record contract as every other corruption.
    */
  val MaxDecompressedBytes: Long = Int.MaxValue.toLong - 64L

  def parseAuto(bytes: Array[Byte],
                maxDecompressedBytes: Long = MaxDecompressedBytes): Iterator[WarcRecord] =
    if (!isGzip(bytes)) parseIterator(bytes)
    else {
      val out = new java.io.ByteArrayOutputStream()
      val bad = Seq.newBuilder[WarcRecord]
      val it = gunzipMembers(bytes, maxDecompressedBytes)
      var capped = false
      while (it.hasNext && !capped) it.next() match {
        case (off, Right(data)) =>
          if (out.size().toLong + data.length > maxDecompressedBytes) {
            capped = true
            bad += WarcRecord(off.toLong, valid = false,
              s"gzip member: decompressed output exceeds $maxDecompressedBytes bytes",
              "", "", "", -1L, Array.emptyByteArray)
          } else out.write(data)
        case (off, Left(err)) =>
          bad += WarcRecord(off.toLong, valid = false, s"gzip member: $err",
            "", "", "", -1L, Array.emptyByteArray)
      }
      bad.result().iterator ++ parseIterator(out.toByteArray)
    }

  /** Decompress a stream of concatenated gzip members, one at a time:
    * (compressed member offset, decompressed bytes or failure reason).
    * Inflater-based rather than GZIPInputStream so a member's exact
    * compressed extent is known (`getBytesRead`) and a corrupt member
    * can be skipped by resyncing on the gzip magic — GZIPInputStream
    * aborts the whole stream at the first bad member.
    */
  private[sources] def gunzipMembers(
      bytes: Array[Byte],
      maxMemberBytes: Long = MaxDecompressedBytes): Iterator[(Int, Either[String, Array[Byte]])] =
    new scala.collection.AbstractIterator[(Int, Either[String, Array[Byte]])] {
      private var pos = if (bytes.length >= 2) 0 else -1
      override def hasNext: Boolean = pos >= 0
      override def next(): (Int, Either[String, Array[Byte]]) = {
        val cur = pos
        val (res, nxt) = gzMember(bytes, cur, maxMemberBytes)
        pos =
          if (nxt > cur) (if (nxt >= bytes.length) -1 else nxt)
          else byteIndexOf(bytes, GzMagic, cur + 1) // corrupt member: resync
        (cur, res)
      }
    }

  /** One gzip member starting at `pos`: (decompressed bytes or error,
    * offset just past the member's trailer; -1 on failure).
    */
  private def gzMember(bytes: Array[Byte], pos: Int,
                       maxMemberBytes: Long = MaxDecompressedBytes): (Either[String, Array[Byte]], Int) = {
    def le32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (pos + 10 > bytes.length) return (Left("truncated gzip header"), -1)
    if (bytes(pos) != 0x1f.toByte || bytes(pos + 1) != 0x8b.toByte)
      return (Left("bad gzip magic"), -1)
    if (bytes(pos + 2) != 8.toByte)
      return (Left(s"unsupported compression method ${bytes(pos + 2)}"), -1)
    val flg = bytes(pos + 3) & 0xff
    var p = pos + 10
    if ((flg & 0x04) != 0) { // FEXTRA: 2-byte LE length + payload
      if (p + 2 > bytes.length) return (Left("truncated FEXTRA"), -1)
      p += 2 + ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8))
    }
    if ((flg & 0x08) != 0) { // FNAME: NUL-terminated
      while (p < bytes.length && bytes(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x10) != 0) { // FCOMMENT: NUL-terminated
      while (p < bytes.length && bytes(p) != 0) p += 1
      p += 1
    }
    if ((flg & 0x02) != 0) p += 2 // FHCRC
    if (p >= bytes.length) return (Left("truncated gzip header fields"), -1)
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes, p, bytes.length - p)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) {
          // bomb guard: bail BEFORE buffering past the cap, so a
          // hostile member costs at most cap bytes of heap, then
          // quarantines like any other corruption
          if (out.size().toLong + n > maxMemberBytes)
            return (Left(s"member decompresses past $maxMemberBytes bytes"), -1)
          out.write(buf, 0, n)
        }
        else if (!inf.finished()) return (Left("truncated deflate stream"), -1)
      }
      val data = out.toByteArray
      val trailer = p + inf.getBytesRead.toInt
      if (trailer + 8 > bytes.length) return (Left("truncated gzip trailer"), -1)
      val crc = new java.util.zip.CRC32()
      crc.update(data, 0, data.length)
      if (le32(trailer) != crc.getValue) return (Left("CRC32 mismatch"), -1)
      if (le32(trailer + 4) != (data.length & 0xffffffffL))
        return (Left("ISIZE mismatch"), -1)
      (Right(data), trailer + 8)
    } catch {
      case e: java.util.zip.DataFormatException =>
        (Left(s"deflate error: ${Option(e.getMessage).getOrElse("corrupt")}"), -1)
    } finally inf.end()
  }

  /** `bytes` as one gzip member — the writer half of the `.warc.gz`
    * round trip (member-per-record when called per rendered record,
    * whole-file when called on a concatenation).
    */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.finish(); gz.close()
    out.toByteArray
  }

  /** A WARC `response` payload's HTTP envelope, split apart. `isHttp`
    * is false when the payload carries no HTTP head (no `HTTP/` prefix
    * or no CRLF CRLF within the bounded header window) — then `body` is
    * the whole payload and status/headers are empty, the same tolerant
    * posture as the record parser.
    */
  final case class HttpEnvelope(
      isHttp: Boolean,
      status: Int,
      headers: Map[String, String],
      body: Array[Byte])

  /** Split an HTTP response payload on the FIRST CRLF CRLF — the same
    * byte discipline as the record parser (the body is opaque bytes; an
    * HTML body legally contains CRLF runs and header-shaped text, so
    * only the first terminator after an `HTTP/` status line frames the
    * envelope). Header names lowercase; the head itself decodes as
    * ISO-8859-1 (HTTP/1.1's charset — a byte-transparent decode, so no
    * header byte is ever lost to a UTF-8 replacement).
    */
  def splitHttp(payload: Array[Byte]): HttpEnvelope = {
    val isHttpHead = payload.length >= 5 &&
      payload(0) == 'H' && payload(1) == 'T' && payload(2) == 'T' &&
      payload(3) == 'P' && payload(4) == '/'
    val sep = if (isHttpHead)
      byteIndexOf(payload, CrlfCrlf, 0, math.min(payload.length, MaxHeaderBytes))
    else -1
    if (sep < 0) return HttpEnvelope(isHttp = false, -1, Map.empty, payload)
    val head = new String(payload, 0, sep,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n", -1)
    val status = lines.head.split(" ", 3) match {
      case Array(_, code, _*) if code.nonEmpty && code.length <= 3 &&
          code.forall(c => c >= '0' && c <= '9') => code.toInt
      case _ => -1
    }
    val headers = lines.tail.flatMap { l =>
      val i = l.indexOf(':')
      if (i <= 0) None
      else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    HttpEnvelope(isHttp = true, status, headers,
      java.util.Arrays.copyOfRange(payload, sep + 4, payload.length))
  }

  /** The crawl pipeline's first columnar boundary: valid `response`
    * records from [[records]]' output, HTTP envelope split off —
    * (path, offset, record_id, target_uri, http_status, http_headers,
    * http_body). Non-HTTP payloads keep status = -1 / empty headers with
    * the raw payload as body, so a resource-record crawl (payload = the
    * object itself) flows through the same column. Per-row byte codec →
    * the same justified typed-kernel shape as [[records]]; everything
    * downstream (HTML extraction, URL ops) is columns.
    */
  def httpResponses(records: DataFrame): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.where(col("valid") && col("warc_type") === "response")
      .select(col("path").cast("string"), col("offset"), col("record_id"),
        col("target_uri"), col("payload"))
      .as[(String, Long, String, String, Array[Byte])]
      .map { case (path, off, id, uri, pay) =>
        val e = splitHttp(if (pay == null) Array.emptyByteArray else pay)
        (path, off, id, uri, e.status, e.headers, e.body)
      }
      .toDF("path", "offset", "record_id", "target_uri", "http_status",
        "http_headers", "http_body")
  }

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
    // ASCII digits only with a length cap: `isDigit` admits non-ASCII
    // Unicode digits (which toLong rejects with an exception) and a
    // 20+-digit ASCII value overflows toLong the same way — either would
    // escape the flatMap task and abort the FILE, violating the
    // per-record quarantine contract on untrusted crawl input. 18 digits
    // (< 10^18) also keeps payloadEnd arithmetic overflow-free in Long.
    val cl = fields.get("content-length") match {
      case Some(s) if s.nonEmpty && s.length <= 18 &&
          s.forall(c => c >= '0' && c <= '9') => s.toLong
      case _ =>
        return (invalid("missing or malformed Content-Length", tpe, id, uri),
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
    * corpora, re-sharding a parsed crawl back out). Header field values
    * must not contain CR/LF: an embedded newline would inject header
    * lines or break the Content-Length framing of the emitted record
    * (the writer mirror of the parser's byte-framing discipline), so a
    * value carrying either is rejected loudly rather than silently
    * corrupting the output stream.
    */
  def render(warcType: String, recordId: String, targetUri: String,
             payload: Array[Byte]): Array[Byte] = {
    def checked(name: String, v: String): String = {
      require(v.indexOf('\r') < 0 && v.indexOf('\n') < 0,
        s"render: $name contains CR/LF — would corrupt WARC header framing")
      v
    }
    checked("warcType", warcType); checked("recordId", recordId)
    checked("targetUri", targetUri)
    val header = s"WARC/1.0\r\nWARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: $recordId\r\nWARC-Target-URI: $targetUri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n"
    header.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  /** Explode a (`path`, `content`) frame of WARC blobs into one row per
    * record: (path, offset, valid, error, warc_type, record_id,
    * target_uri, content_length, payload). Raw and gzipped blobs are
    * auto-detected per file ([[parseAuto]]) — a directory mixing `.warc`
    * and `.warc.gz` reads with one call.
    */
  def records(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val typed: Dataset[(String, Array[Byte])] =
      files.select(col("path").cast("string"), col("content"))
        .as[(String, Array[Byte])]
    typed.flatMap { case (path, bytes) =>
      parseAuto(if (bytes == null) Array.emptyByteArray else bytes)
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
  def readStream(spark: org.apache.spark.sql.SparkSession, path: String,
                 maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
    val bounded = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    records(bounded.load(path))
  }
}
