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
    // 1. BOM
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
    * "charset=" in text does not hijack the decode.
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
        val cs = lookup(m.group(1))
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
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "decode_http_body",
      exprs => DecodeHttpBodyExpr(exprs.head, exprs(1)), "built-in")

  def decodeHttpBody(body: Column, contentType: Column): Column =
    call_function("decode_http_body", body, contentType)
}
