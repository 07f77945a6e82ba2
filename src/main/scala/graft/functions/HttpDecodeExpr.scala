package graft.functions

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `decode_http_body(body BINARY, content_type STRING)` — charset-aware
  * decode of a fetched HTTP body: real crawls are a charset zoo
  * (windows-1252 and Latin-1 dominate the long tail; Shift-JIS / EUC /
  * GBK are common regionally), and decoding everything as UTF-8 turns
  * every one of those pages into replacement-char soup before any text
  * stage sees it. This is the declaration-driven decode CCNet-class
  * pipelines run between the HTTP split and HTML extraction.
  *
  * Charset resolution, in browser priority order:
  *
  *  1. a byte-order mark (UTF-8 / UTF-16LE / UTF-16BE) — authoritative,
  *     and the BOM itself is not part of the document;
  *  2. `charset=` parameter of the Content-Type header value (the
  *     second argument — pass "" when the header is absent);
  *  3. an HTML `<meta charset=..>` / `<meta http-equiv .. charset=..>`
  *     sniff over the first 4 KiB (ASCII-compatible scan, the WHATWG
  *     prescan);
  *  4. UTF-8.
  *
  * Quarantine posture (crawl input is untrusted and must never abort a
  * task): an unknown/illegal charset name falls back to UTF-8, and the
  * decode itself REPLACEs malformed/unmappable sequences (U+FFFD) —
  * the function is total.
  *
  * Map-side codegen'd kernel; zero shuffle at any corpus size.
  */
object HttpDecodeKernel {

  private val MetaScanBytes = 4096

  // charset=... inside a content-type value or a <meta> tag head;
  // group(1) = the name, optionally quoted
  private val CharsetParam =
    java.util.regex.Pattern.compile(
      """charset\s*=\s*["']?\s*([A-Za-z0-9][A-Za-z0-9._:\-]*)""",
      java.util.regex.Pattern.CASE_INSENSITIVE)

  def decode(body: Array[Byte], contentType: UTF8String): UTF8String = {
    // 1. BOM. UTF-32 sniffs FIRST: its LE BOM (FF FE 00 00) has the
    // UTF-16LE BOM as a prefix, and its BE BOM (00 00 FE FF) would
    // otherwise fall through to the declaration path — either way a
    // UTF-32 body misread as UTF-16/declared charset is replacement soup
    if (body.length >= 4 && body(0) == 0xFF.toByte && body(1) == 0xFE.toByte &&
        body(2) == 0 && body(3) == 0)
      return decodeWith(body, 4, Charset.forName("UTF-32LE"))
    if (body.length >= 4 && body(0) == 0 && body(1) == 0 &&
        body(2) == 0xFE.toByte && body(3) == 0xFF.toByte)
      return decodeWith(body, 4, Charset.forName("UTF-32BE"))
    if (body.length >= 3 && body(0) == 0xEF.toByte && body(1) == 0xBB.toByte &&
        body(2) == 0xBF.toByte)
      return decodeWith(body, 3, StandardCharsets.UTF_8)
    if (body.length >= 2 && body(0) == 0xFF.toByte && body(1) == 0xFE.toByte)
      return decodeWith(body, 2, StandardCharsets.UTF_16LE)
    if (body.length >= 2 && body(0) == 0xFE.toByte && body(1) == 0xFF.toByte)
      return decodeWith(body, 2, StandardCharsets.UTF_16BE)
    // 2. header charset
    fromDeclaration(contentType.toString) match {
      case Some(cs) => return decodeWith(body, 0, cs)
      case None => ()
    }
    // 3. <meta> prescan: the head of the body read byte-transparently
    val n = math.min(body.length, MetaScanBytes)
    val head = new String(body, 0, n, StandardCharsets.ISO_8859_1)
    val meta = metaCharset(head)
    decodeWith(body, 0, meta.getOrElse(StandardCharsets.UTF_8))
  }

  /** Charset named in a Content-Type-shaped declaration, if it parses
    * AND the JVM supports it (unknown names are NO declaration —
    * quarantine, not abort).
    */
  def fromDeclaration(decl: String): Option[Charset] = {
    if (decl == null || decl.isEmpty) return None
    val m = CharsetParam.matcher(decl)
    if (!m.find()) return None
    lookup(m.group(1))
  }

  /** First `<meta ... charset=...>` declaration in the prescanned head
    * — covers both `<meta charset=utf-8>` and the http-equiv form
    * (whose `content` value embeds the same `charset=` parameter).
    * Only matches inside a meta tag, so a page that merely MENTIONS
    * "charset=" in text does not hijack the decode. A meta-declared
    * UTF-16 variant maps to UTF-8 (the WHATWG prescan rule: a document
    * whose in-body declaration was ASCII-readable cannot actually be
    * UTF-16 — honoring the label would shred the real bytes).
    */
  def metaCharset(head: String): Option[Charset] = {
    var from = 0
    val lower = head.toLowerCase(java.util.Locale.ROOT)
    while (from >= 0 && from < lower.length) {
      val tag = lower.indexOf("<meta", from)
      if (tag < 0) return None
      val end = lower.indexOf('>', tag)
      val stop = if (end < 0) lower.length else end
      val m = CharsetParam.matcher(lower.substring(tag, stop))
      if (m.find()) {
        val cs = lookup(m.group(1)).map { c =>
          val n = c.name().toUpperCase(java.util.Locale.ROOT)
          if (n.startsWith("UTF-16") || n.startsWith("UTF-32"))
            StandardCharsets.UTF_8
          else c
        }
        if (cs.isDefined) return cs
      }
      from = stop + 1
    }
    None
  }

  private def lookup(name: String): Option[Charset] =
    try Some(Charset.forName(name))
    catch { case _: Exception => None }

  private def decodeWith(body: Array[Byte], offset: Int, cs: Charset): UTF8String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val out = dec.decode(
      java.nio.ByteBuffer.wrap(body, offset, body.length - offset)).toString
    UTF8String.fromString(out)
  }

  // a chunk-size line is a bounded hex number (+ optional extensions):
  // anything longer is not chunked framing
  private val MaxChunkSizeLine = 256

  /** Reassemble a `Transfer-Encoding: chunked` body (RFC 9112 §7.1):
    * hex-size line (chunk extensions after `;` ignored) CRLF, data CRLF,
    * …, `0` CRLF, optional trailer fields — dropped; they are framing,
    * not content. No-op unless `chunked` is the FINAL listed transfer
    * coding. Quarantine posture (crawl bytes are untrusted, the
    * function is total):
    *
    *  - the FIRST size line doesn't parse → the body was never chunked
    *    framing despite the header (servers lie): returned UNCHANGED;
    *  - framing breaks after valid chunks (bad mid-stream size line,
    *    missing data CRLF) → the successfully reassembled prefix;
    *  - a chunk's data runs past the record end (truncated capture) →
    *    whatever bytes are present (honest truncation).
    */
  def dechunk(body: Array[Byte], transferEncoding: UTF8String): Array[Byte] = {
    val te = if (transferEncoding == null) "" else transferEncoding.toString
    val isChunked = te.toLowerCase(java.util.Locale.ROOT)
      .split(",").map(_.trim).lastOption.contains("chunked")
    if (!isChunked || body.length == 0) return body
    val out = new java.io.ByteArrayOutputStream(body.length)
    var pos = 0
    var first = true
    def salvage(): Array[Byte] =
      if (first) body else out.toByteArray
    while (pos < body.length) {
      // the size line: bytes up to CRLF, bounded
      val lim = math.min(body.length - 1, pos + MaxChunkSizeLine)
      var eol = -1
      var i = pos
      while (eol < 0 && i < lim) {
        if (body(i) == '\r' && body(i + 1) == '\n') eol = i
        i += 1
      }
      if (eol < 0) return salvage()
      var hexEnd = pos
      while (hexEnd < eol && body(hexEnd) != ';' && body(hexEnd) != ' ')
        hexEnd = hexEnd + 1
      if (hexEnd == pos) return salvage()
      var size = 0L
      var j = pos
      while (j < hexEnd) {
        val d = Character.digit(body(j).toChar, 16)
        if (d < 0) return salvage()
        size = size * 16 + d
        if (size > Int.MaxValue) return salvage()
        j += 1
      }
      pos = eol + 2
      if (size == 0) return out.toByteArray // trailers are framing, done
      if (pos + size > body.length) { // truncated capture
        if (pos < body.length) out.write(body, pos, body.length - pos)
        return out.toByteArray
      }
      out.write(body, pos, size.toInt)
      pos += size.toInt
      first = false
      // data must be followed by CRLF; anything else is broken framing
      if (pos + 2 <= body.length && body(pos) == '\r' && body(pos + 1) == '\n')
        pos += 2
      else return out.toByteArray
    }
    out.toByteArray // ran off the end without a 0-chunk: keep the prefix
  }
}

/** `dechunk_http_body(body BINARY, transfer_encoding STRING) → BINARY`:
  * [[HttpDecodeKernel.dechunk]] as a codegen'd expression — runs between
  * the HTTP envelope split (which carries the header) and the charset
  * decode, the last byte-level gap to raw crawl captures.
  */
case class DechunkHttpBodyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "dechunk_http_body(body BINARY, transfer_encoding STRING) expected")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(body: Any, te: Any): Any =
    HttpDecodeKernel.dechunk(
      body.asInstanceOf[Array[Byte]], te.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, t) => s"graft.functions.HttpDecodeKernel.dechunk($b, $t)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dechunk_http_body"
}

case class DecodeHttpBodyExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "decode_http_body(body BINARY, content_type STRING) expected")
  override def dataType: DataType = StringType
  override def nullSafeEval(body: Any, ct: Any): Any =
    HttpDecodeKernel.decode(
      body.asInstanceOf[Array[Byte]], ct.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, c) => s"graft.functions.HttpDecodeKernel.decode($b, $c)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "decode_http_body"
}

object HttpDecodeExpr {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "decode_http_body",
      exprs => DecodeHttpBodyExpr(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dechunk_http_body",
      exprs => DechunkHttpBodyExpr(exprs.head, exprs(1)), "built-in")
  }

  def decodeHttpBody(body: Column, contentType: Column): Column =
    call_function("decode_http_body", body, contentType)

  def dechunkHttpBody(body: Column, transferEncoding: Column): Column =
    call_function("dechunk_http_body", body, transferEncoding)
}
