package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{HttpDecodeExpr, HttpDecodeKernel}

/** [[HttpDecodeKernel]] / `decode_http_body`: charset resolution
  * precedence (BOM > header > meta > UTF-8), the quarantine posture on
  * malformed declarations and broken bytes, and the CrawlPipeline
  * integration end to end.
  */
class HttpDecodeSpec extends SparkSuite {
  import spark.implicits._

  private def dec(body: Array[Byte], ct: String): String =
    HttpDecodeKernel.decode(body, UTF8String.fromString(ct)).toString

  test("header charset drives the decode: latin-1, cp1252, shift_jis") {
    val s = "café — äöü"
    assert(dec("café àèî".getBytes(StandardCharsets.ISO_8859_1),
      "text/html; charset=ISO-8859-1") === "café àèî")
    assert(dec("café €—™".getBytes("windows-1252"),
      "text/html; charset=windows-1252") === "café €—™")
    assert(dec("日本語のテキスト".getBytes("Shift_JIS"),
      "text/html;charset=shift_jis") === "日本語のテキスト")
    // quoted name, mixed case, extra params
    assert(dec(s.getBytes(StandardCharsets.UTF_8),
      "Text/HTML; Charset=\"utf-8\"; boundary=x") === s)
  }

  test("meta prescan fires only without a header charset, and only inside a tag") {
    val body = "<meta charset=iso-8859-1><p>café</p>".getBytes(StandardCharsets.ISO_8859_1)
    assert(dec(body, "text/html") === "<meta charset=iso-8859-1><p>café</p>")
    assert(dec(body, "") === "<meta charset=iso-8859-1><p>café</p>")
    // header beats meta
    val utf = "<meta charset=iso-8859-1><p>café</p>".getBytes(StandardCharsets.UTF_8)
    assert(dec(utf, "text/html; charset=utf-8") ===
      "<meta charset=iso-8859-1><p>café</p>")
    // http-equiv form
    val he = ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=windows-1252\"><p>€</p>").getBytes("windows-1252")
    assert(dec(he, "").endsWith("<p>€</p>"))
    // 'charset=' in TEXT (outside any meta tag) must not hijack
    val trap = "<p>set charset=utf-16le in config</p> café"
      .getBytes(StandardCharsets.UTF_8)
    assert(dec(trap, "") === "<p>set charset=utf-16le in config</p> café")
  }

  test("a BOM overrides a lying header; the BOM is not part of the document") {
    val t = "utf16 text é ✓"
    val le = Array(0xFF.toByte, 0xFE.toByte) ++ t.getBytes(StandardCharsets.UTF_16LE)
    val be = Array(0xFE.toByte, 0xFF.toByte) ++ t.getBytes(StandardCharsets.UTF_16BE)
    val u8 = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      t.getBytes(StandardCharsets.UTF_8)
    assert(dec(le, "text/html; charset=ISO-8859-1") === t)
    assert(dec(be, "text/html; charset=ISO-8859-1") === t)
    assert(dec(u8, "text/html; charset=ISO-8859-1") === t)
  }

  test("quarantine: unknown charset name falls back, broken bytes REPLACE, never throws") {
    val utf = "fallback café".getBytes(StandardCharsets.UTF_8)
    assert(dec(utf, "text/html; charset=bogus-zz-9") === "fallback café")
    assert(dec(utf, "text/html; charset=" + "x".repeat(100)) === "fallback café")
    // an illegal charset NAME (forName would throw IllegalCharsetNameException)
    assert(dec(utf, "text/html; charset=utf!!8") === "fallback café")
    // malformed UTF-8 replaces, no abort
    val broken = Array(0xC3.toByte) // dangling lead byte
    assert(dec(broken, "") === "�")
    assert(dec(Array.emptyByteArray, "") === "")
    // meta naming an unsupported charset: skipped, UTF-8 wins
    assert(dec("<meta charset=not-real-9><p>ok café</p>"
      .getBytes(StandardCharsets.UTF_8), "") === "<meta charset=not-real-9><p>ok café</p>")
  }

  test("expression: codegen plan, null-safe") {
    val df = Seq(
      (1L, "café".getBytes(StandardCharsets.ISO_8859_1), "text/html; charset=iso-8859-1"),
      (2L, "café".getBytes(StandardCharsets.UTF_8), ""),
      (3L, null.asInstanceOf[Array[Byte]], ""))
      .toDF("id", "body", "ct")
      .select(col("id"), HttpDecodeExpr.decodeHttpBody(col("body"), col("ct")).as("t"))
    val got = df.as[(Long, Option[String])].collect().sortBy(_._1)
    assert(got === Array((1L, Some("café")), (2L, Some("café")), (3L, None)))
    val plan = spark.range(2)
      .select(HttpDecodeExpr.decodeHttpBody(
        encode(concat(lit("x"), col("id").cast("string")), "UTF-8"), lit("")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("pipeline integration: a Latin-1 page survives pageDocsFromRecords intact") {
    val html = "<html><body><p>café crème — naïve</p></body></html>"
    val head = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\n"
    // Latin-1 cannot encode '—': build the page without it for the body,
    // with the accents proving the charset path
    val page = html.replace("—", "-")
    val payload = head.getBytes(StandardCharsets.ISO_8859_1) ++
      page.getBytes(StandardCharsets.ISO_8859_1)
    val recs = Seq(("mem://f", 0L, "<urn:x:1>", "http://a.com/p", payload,
        true, "response"))
      .toDF("path", "offset", "record_id", "target_uri", "payload",
        "valid", "warc_type")
    val out = graft.corpus.CrawlPipeline.pageDocsFromRecords(recs)
      .select("text").as[String].collect()
    assert(out.toSeq === Seq("café crème - naïve"))
  }

  test("UTF-32 BOMs are not misread as UTF-16LE / a declaration") {
    val s = "café ✓"
    assert(dec(s.getBytes("UTF-32LE").prependedAll(
      Array(0xFF.toByte, 0xFE.toByte, 0.toByte, 0.toByte)), "") === s)
    assert(dec(s.getBytes("UTF-32BE").prependedAll(
      Array(0.toByte, 0.toByte, 0xFE.toByte, 0xFF.toByte)),
      "text/html; charset=ISO-8859-1") === s)
    // a genuine UTF-16LE BOM (not followed by 00 00) still decodes as such
    assert(dec(Array(0xFF.toByte, 0xFE.toByte) ++ s.getBytes("UTF-16LE"),
      "") === s)
  }

  test("meta-declared UTF-16 maps to UTF-8 (WHATWG prescan rule)") {
    // an ASCII-readable in-body declaration cannot be UTF-16: honoring
    // it would shred the real (UTF-8) bytes
    val body = "<meta charset=utf-16le><p>café ✓</p>"
      .getBytes(StandardCharsets.UTF_8)
    assert(dec(body, "") === "<meta charset=utf-16le><p>café ✓</p>")
    // …while a HEADER-declared UTF-16 on actual UTF-16 bytes is honored
    val u16 = "no bom here café".getBytes(StandardCharsets.UTF_16LE)
    assert(dec(u16, "text/html; charset=utf-16le") === "no bom here café")
  }

  private def chunk(body: Array[Byte], te: String): Array[Byte] =
    HttpDecodeKernel.dechunk(body, UTF8String.fromString(te))

  test("dechunk: framing removed exactly — sizes, extensions, trailers, CRLFs") {
    def b(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)
    // plain multi-chunk; hex size crosses one nibble (0x10)
    assert(chunk(b("5\r\nhello\r\n10\r\n 0123456789abcde\r\n0\r\n\r\n"),
      "chunked").toSeq === b("hello 0123456789abcde").toSeq)
    // uppercase hex, chunk extension, trailer field
    assert(chunk(b("A;ext=\"q\"\r\nhelloworld\r\n0\r\nx-t: v\r\n\r\n"),
      "chunked").toSeq === b("helloworld").toSeq)
    // chunked must be the FINAL coding; a lone gzip is not dechunked
    val raw = b("5\r\nhello\r\n0\r\n\r\n")
    assert(chunk(raw, "gzip").toSeq === raw.toSeq)
    assert(chunk(raw, "gzip, chunked").toSeq === b("hello").toSeq)
    assert(chunk(raw, "").toSeq === raw.toSeq)
  }

  test("dechunk quarantine: lying header, broken mid-stream framing, truncated capture") {
    def b(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)
    // header says chunked but the body never was: unchanged
    val lie = b("<html>just a page</html>")
    assert(chunk(lie, "chunked").toSeq === lie.toSeq)
    // valid first chunk, garbage size line after: keep the good prefix
    assert(chunk(b("5\r\nhello\r\nZZ!\r\nrest"), "chunked").toSeq
      === b("hello").toSeq)
    // missing CRLF after chunk data: stop with what was reassembled
    assert(chunk(b("5\r\nhelloXX"), "chunked").toSeq === b("hello").toSeq)
    // last chunk declares more bytes than the record holds: honest
    // truncation — emit the bytes present
    assert(chunk(b("5\r\nhello\r\n14\r\nonly-ten-b"), "chunked").toSeq
      === b("helloonly-ten-b").toSeq)
    // empty body, chunked header: unchanged (no framing to salvage)
    assert(chunk(Array.emptyByteArray, "chunked").length === 0)
  }

  private def dcmp(body: Array[Byte], ce: String): Array[Byte] =
    HttpDecodeKernel.decompress(body, UTF8String.fromString(ce))

  private def cmp(body: Array[Byte], ce: String): Array[Byte] =
    HttpDecodeKernel.compress(body, UTF8String.fromString(ce))

  test("decompress: gzip / x-gzip / deflate / identity round-trip; stacked codings unwrap right-to-left") {
    val b = "body content — crème brûlée".getBytes(StandardCharsets.UTF_8)
    assert(dcmp(cmp(b, "gzip"), "gzip").toSeq === b.toSeq)
    assert(dcmp(cmp(b, "gzip"), "x-gzip").toSeq === b.toSeq) // label alias
    assert(dcmp(cmp(b, "deflate"), "deflate").toSeq === b.toSeq)
    assert(dcmp(b, "identity").toSeq === b.toSeq)
    assert(dcmp(b, "").toSeq === b.toSeq)
    // listed in APPLY order; removal runs right-to-left
    assert(dcmp(cmp(b, "gzip, deflate"), "gzip, deflate").toSeq === b.toSeq)
    // RAW deflate mislabeled "deflate" (the famous server bug): fallback
    val raw = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(b); d.finish()
      val buf = new Array[Byte](4096)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    assert(dcmp(raw, "deflate").toSeq === b.toSeq)
  }

  test("decompress quarantine: lying label unchanged, instant corruption null, truncation salvages the prefix") {
    val plain = "<html>never was gzip</html>".getBytes(StandardCharsets.UTF_8)
    // labeled gzip, no gzip magic: the server lied — unchanged
    assert(dcmp(plain, "gzip").toSeq === plain.toSeq)
    // gzip magic then immediate garbage: nothing decodable — null
    val corrupt = Array(0x1f.toByte, 0x8b.toByte, 0x09.toByte) ++
      Array.fill[Byte](16)(0x55)
    assert(dcmp(corrupt, "gzip") === null)
    // truncated capture: the decompressed PREFIX comes back (real page
    // content; WARC truncates mid-body constantly)
    val big = ("lorem ipsum dolor sit amet " * 4000).getBytes(StandardCharsets.UTF_8)
    val gz = cmp(big, "gzip")
    val cut = dcmp(gz.take(gz.length / 2), "gzip")
    assert(cut != null && cut.length > 0 && cut.length < big.length)
    assert(big.take(cut.length).toSeq === cut.toSeq)
    // truncated deflate salvages too
    val zcut = dcmp(cmp(big, "deflate").take(200), "deflate")
    assert(zcut != null && zcut.length > 0 && big.take(zcut.length).toSeq === zcut.toSeq)
    // an undecodable coding stops the walk: bytes pass through as-is
    assert(dcmp(plain, "br").toSeq === plain.toSeq)
    assert(dcmp(cmp(plain, "gzip"), "br, gzip") != null) // gzip removed…
    assert(dcmp(cmp(plain, "gzip"), "br, gzip").toSeq === plain.toSeq)
    assert(dcmp(cmp(plain, "gzip"), "gzip, br").toSeq === cmp(plain, "gzip").toSeq)
    // empty body: unchanged under every coding label
    assert(dcmp(Array.emptyByteArray, "gzip").length === 0)
    assert(dcmp(Array.emptyByteArray, "deflate").length === 0)
  }

  test("decompress bomb guard: output truncates at the per-body cap") {
    val zeros = new Array[Byte](80 * 1024 * 1024) // ~80 KiB gzipped
    val out = dcmp(cmp(zeros, "gzip"), "gzip")
    // the guard stops BEFORE the overflowing buffer write, so the
    // truncation point is within one read-buffer of the cap
    assert(out.length <= HttpDecodeKernel.MaxDecompressedBodyBytes)
    assert(out.length > HttpDecodeKernel.MaxDecompressedBodyBytes - 64 * 1024)
  }

  test("compress rejects an unknown coding loudly (a lying header must not be forged)") {
    val b = "x".getBytes(StandardCharsets.UTF_8)
    val e = intercept[IllegalArgumentException] { cmp(b, "br") }
    assert(e.getMessage.contains("br"))
  }

  test("decompress expression: codegen plan, nullable result surfaces as SQL NULL") {
    val corrupt = Array(0x1f.toByte, 0x8b.toByte, 0x09.toByte) ++
      Array.fill[Byte](16)(0x55)
    val df = Seq(
      (1L, cmp("page one".getBytes(StandardCharsets.UTF_8), "gzip"), "gzip"),
      (2L, "plain".getBytes(StandardCharsets.UTF_8), ""),
      (3L, corrupt, "gzip"),
      (4L, null.asInstanceOf[Array[Byte]], "gzip"))
      .toDF("id", "body", "ce")
      .select(col("id"),
        HttpDecodeExpr.decodeHttpBody(
          HttpDecodeExpr.decompressHttpBody(col("body"), col("ce")),
          lit("")).as("t"))
    val got = df.as[(Long, Option[String])].collect().sortBy(_._1)
    assert(got === Array((1L, Some("page one")), (2L, Some("plain")),
      (3L, None), (4L, None)))
    val plan = spark.range(2)
      .select(HttpDecodeExpr.decompressHttpBody(
        graft.functions.HttpDecodeExpr.compressHttpBody(
          encode(col("id").cast("string"), "UTF-8"), lit("gzip")),
        lit("gzip")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("pipeline integration: gzip-under-chunked Latin-1 page survives; an undecodable body nulls through") {
    val page = "<html><body><p>café crème - naïve</p></body></html>"
    val pb = cmp(page.getBytes(StandardCharsets.ISO_8859_1), "gzip")
    val framed = s"${pb.length.toHexString}\r\n".getBytes(StandardCharsets.ISO_8859_1) ++
      pb ++ "\r\n0\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n" +
      "Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n\r\n")
    val good = head.getBytes(StandardCharsets.ISO_8859_1) ++ framed
    val badBody = Array(0x1f.toByte, 0x8b.toByte, 0x09.toByte) ++
      Array.fill[Byte](16)(0x55)
    val bad = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Content-Encoding: gzip\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++ badBody
    val recs = Seq(
      ("mem://f", 0L, "<urn:x:3>", "http://a.com/p", good, true, "response"),
      ("mem://f", 1L, "<urn:x:4>", "http://a.com/q", bad, true, "response"))
      .toDF("path", "offset", "record_id", "target_uri", "payload",
        "valid", "warc_type")
    val out = graft.corpus.CrawlPipeline.pageDocsFromRecords(recs)
      .select("url", "text").as[(String, Option[String])].collect().sortBy(_._1)
    assert(out.toSeq === Seq(("http://a.com/p", Some("café crème - naïve")),
      ("http://a.com/q", None)))
  }

  test("pipeline integration: a chunked Latin-1 page survives pageDocsFromRecords intact") {
    val page = "<html><body><p>café crème - naïve</p></body></html>"
    val pb = page.getBytes(StandardCharsets.ISO_8859_1)
    val framed = s"${pb.length.toHexString}\r\n".getBytes(StandardCharsets.ISO_8859_1) ++
      pb ++ "\r\n0\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n")
    val payload = head.getBytes(StandardCharsets.ISO_8859_1) ++ framed
    val recs = Seq(("mem://f", 0L, "<urn:x:2>", "http://a.com/p", payload,
        true, "response"))
      .toDF("path", "offset", "record_id", "target_uri", "payload",
        "valid", "warc_type")
    val out = graft.corpus.CrawlPipeline.pageDocsFromRecords(recs)
      .select("text").as[String].collect()
    assert(out.toSeq === Seq("café crème - naïve"))
  }
}
