package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.Warc

class WarcSpec extends SparkSuite {
  import spark.implicits._

  private def rec(id: Int, payload: Array[Byte]): Array[Byte] =
    Warc.render("response", s"<urn:test:$id>", s"http://t/$id", payload)

  test("render -> parseAll round trip, including CRLF runs and decoy headers inside payloads") {
    // payload 2 contains a byte-perfect WARC header + CRLF CRLF runs: any
    // delimiter-based splitter would shear it; Content-Length framing must not
    val p1 = "hello world".getBytes(UTF_8)
    val p2 = "x\r\n\r\nWARC/1.0\r\nContent-Length: 999999\r\n\r\ny".getBytes(UTF_8)
    val p3 = Array[Byte]()
    val blob = rec(1, p1) ++ rec(2, p2) ++ rec(3, p3)
    val rs = Warc.parseAll(blob)
    assert(rs.length === 3)
    assert(rs.forall(_.valid))
    assert(rs.map(_.record_id) === Seq("<urn:test:1>", "<urn:test:2>", "<urn:test:3>"))
    assert(rs.map(_.target_uri) === Seq("http://t/1", "http://t/2", "http://t/3"))
    assert(rs.map(_.content_length) === Seq(p1.length.toLong, p2.length.toLong, 0L))
    assert(rs(1).payload.toSeq === p2.toSeq)
    assert(rs(0).offset === 0L && rs(1).offset === rec(1, p1).length.toLong)
  }

  test("content length counts BYTES: multi-byte UTF-8 payload survives") {
    val p = "héllo — 世界 😀".getBytes(UTF_8)
    assert(p.length > "héllo — 世界 😀".length)
    val rs = Warc.parseAll(rec(7, p))
    assert(rs.length === 1 && rs.head.valid)
    assert(rs.head.content_length === p.length.toLong)
    assert(new String(rs.head.payload, UTF_8) === "héllo — 世界 😀")
  }

  test("garbage before and between records resyncs on the magic") {
    val blob = "random junk".getBytes(UTF_8) ++ rec(1, "a".getBytes(UTF_8)) ++
      "more junk \r\n no magic here".getBytes(UTF_8) ++ rec(2, "b".getBytes(UTF_8))
    val rs = Warc.parseAll(blob)
    assert(rs.count(_.valid) === 2)
    assert(rs.filter(_.valid).map(r => new String(r.payload, UTF_8)) === Seq("a", "b"))
  }

  test("truncated payload quarantines that record; earlier records parse") {
    val good = rec(1, "keep me".getBytes(UTF_8))
    val bad = rec(2, "this payload will be cut".getBytes(UTF_8)).dropRight(20)
    val rs = Warc.parseAll(good ++ bad)
    assert(rs.length === 2)
    assert(rs.head.valid && new String(rs.head.payload, UTF_8) === "keep me")
    assert(!rs(1).valid && rs(1).error.contains("truncated"))
    assert(rs(1).record_id === "<urn:test:2>")
  }

  test("missing Content-Length quarantines and resyncs to the next record") {
    val broken = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:test:9>\r\n\r\n").getBytes(UTF_8)
    val rs = Warc.parseAll(broken ++ rec(2, "ok".getBytes(UTF_8)))
    assert(rs.length === 2)
    assert(!rs.head.valid && rs.head.error.contains("Content-Length"))
    assert(rs(1).valid && new String(rs(1).payload, UTF_8) === "ok")
  }

  test("final record without trailing CRLF CRLF is tolerated") {
    val blob = rec(1, "a".getBytes(UTF_8)).dropRight(4)
    val rs = Warc.parseAll(blob)
    assert(rs.length === 1 && rs.head.valid &&
      new String(rs.head.payload, UTF_8) === "a")
  }

  test("records() explodes blobs distributively; read() scans real files via binaryFile") {
    val fileA = rec(1, "aa".getBytes(UTF_8)) ++ rec(2, "bb".getBytes(UTF_8))
    val fileB = rec(3, "cc".getBytes(UTF_8))
    val inMem = Seq(("mem://a", fileA), ("mem://b", fileB)).toDF("path", "content")
    val got = Warc.records(inMem)
      .select("path", "record_id", "content_length")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("mem://a", "<urn:test:1>", 2L),
      ("mem://a", "<urn:test:2>", 2L), ("mem://b", "<urn:test:3>", 2L)))

    val dir = Files.createTempDirectory("warcspec")
    Files.write(dir.resolve("a.warc"), fileA)
    Files.write(dir.resolve("b.warc"), fileB)
    val fromDisk = Warc.read(spark, dir.toString + "/*.warc")
      .select("record_id").as[String].collect().toSet
    assert(fromDisk === Set("<urn:test:1>", "<urn:test:2>", "<urn:test:3>"))
  }

  test("adversarial Content-Length values quarantine the record, never the file") {
    def broken(cl: String): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:test:6>\r\n" +
        s"Content-Length: $cl\r\n\r\n").getBytes(UTF_8)
    // 20+ ASCII digits (toLong overflow), non-ASCII Unicode digits (pass
    // isDigit, fail toLong), and a near-Long.MaxValue value (parses, then
    // payloadEnd arithmetic must not wrap negative and index below zero):
    // each must quarantine as malformed and the NEXT record must parse.
    for (cl <- Seq("99999999999999999999", "١٢٣", "１２３",
        "9223372036854775807")) {
      val rs = Warc.parseAll(broken(cl) ++ rec(2, "ok".getBytes(UTF_8)))
      val (bad, good) = rs.partition(!_.valid)
      assert(bad.nonEmpty && bad.forall(_.error.contains("Content-Length")),
        s"cl=$cl -> ${bad.map(_.error)}")
      assert(good.exists(r => new String(r.payload, UTF_8) == "ok"),
        s"cl=$cl must not take the rest of the file with it")
    }
    // an 18-digit value PARSES (fits the cap) and then legitimately reads
    // as truncated payload — quarantined without any index arithmetic
    // overflow; since the claimed payload covers the rest of the file,
    // there is by the header's own claim nothing left to resync to
    val rs18 = Warc.parseAll(broken("922337203685477580") ++ rec(2, "ok".getBytes(UTF_8)))
    assert(rs18.nonEmpty && !rs18.head.valid && rs18.head.error.contains("truncated"))
  }

  test("render rejects CR/LF in header field values (header injection / framing corruption)") {
    intercept[IllegalArgumentException] {
      Warc.render("response", "<urn:test:1>", "http://t/evil\r\nWARC-Type: x",
        Array.emptyByteArray)
    }
    intercept[IllegalArgumentException] {
      Warc.render("res\nponse", "<urn:test:1>", "http://t/1", Array.emptyByteArray)
    }
  }

  test("member-per-record .warc.gz round trips (the Common Crawl on-disk format)") {
    val p2 = "x\r\n\r\nWARC/1.0\r\nContent-Length: 999999\r\n\r\ny".getBytes(UTF_8)
    val blob = Warc.gzipMember(rec(1, "hello".getBytes(UTF_8))) ++
      Warc.gzipMember(rec(2, p2)) ++
      Warc.gzipMember(rec(3, Array[Byte]()))
    assert(Warc.isGzip(blob))
    val rs = Warc.parseAuto(blob).toSeq
    assert(rs.length === 3 && rs.forall(_.valid))
    assert(rs.map(_.record_id) === Seq("<urn:test:1>", "<urn:test:2>", "<urn:test:3>"))
    assert(rs(1).payload.toSeq === p2.toSeq)
  }

  test("whole-file gzip round trips through the same auto-detection") {
    val raw = rec(1, "aa".getBytes(UTF_8)) ++ rec(2, "bb".getBytes(UTF_8))
    val rs = Warc.parseAuto(Warc.gzipMember(raw)).toSeq
    assert(rs.length === 2 && rs.forall(_.valid))
    assert(rs.map(r => new String(r.payload, UTF_8)) === Seq("aa", "bb"))
  }

  test("corrupt gzip member quarantines itself; the scan resyncs to later members") {
    val m1 = Warc.gzipMember(rec(1, "keep".getBytes(UTF_8)))
    val m2 = Warc.gzipMember(rec(2, "lost".getBytes(UTF_8)))
    val m3 = Warc.gzipMember(rec(3, "alive".getBytes(UTF_8)))
    // corrupt m2's deflate stream mid-member (flip bytes past the header)
    val bad = m2.clone()
    for (i <- 12 until math.min(18, bad.length)) bad(i) = (bad(i) ^ 0x5a).toByte
    val rs = Warc.parseAuto(m1 ++ bad ++ m3).toSeq
    val good = rs.filter(_.valid).map(r => new String(r.payload, UTF_8))
    assert(good.contains("keep") && good.contains("alive"))
    assert(rs.exists(r => !r.valid && r.error.startsWith("gzip member")))
    // CRC corruption (valid deflate, wrong trailer) also quarantines
    val crcBad = m2.clone()
    crcBad(crcBad.length - 8) = (crcBad(crcBad.length - 8) ^ 0xff).toByte
    val rs2 = Warc.parseAuto(m1 ++ crcBad ++ m3).toSeq
    assert(rs2.filter(_.valid).map(r => new String(r.payload, UTF_8)) ===
      Seq("keep", "alive"))
    assert(rs2.exists(r => !r.valid && r.error.contains("CRC32")))
  }

  test("records() auto-detects per file: a directory mixing .warc and .warc.gz reads in one call") {
    val rawFile = rec(1, "raw".getBytes(UTF_8))
    val gzFile = Warc.gzipMember(rec(2, "gz".getBytes(UTF_8)))
    val inMem = Seq(("mem://a.warc", rawFile), ("mem://b.warc.gz", gzFile))
      .toDF("path", "content")
    val got = Warc.records(inMem).where(col("valid"))
      .select("record_id").as[String].collect().toSet
    assert(got === Set("<urn:test:1>", "<urn:test:2>"))
  }

  test("splitHttp: envelope splits on the FIRST CRLF CRLF; header-shaped body text stays body") {
    val body = "<html>\r\n\r\nHTTP/1.1 500 FAKE\r\nX-Decoy: 1\r\n\r\n</html>".getBytes(UTF_8)
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      "X-Crawl: yes\r\n\r\n").getBytes(UTF_8) ++ body
    val e = Warc.splitHttp(payload)
    assert(e.isHttp && e.status === 200)
    assert(e.headers("content-type") === "text/html; charset=utf-8")
    assert(e.headers("x-crawl") === "yes")
    assert(e.body.toSeq === body.toSeq)
    // non-HTTP payload: whole thing is body, tolerant
    val raw = Warc.splitHttp("just bytes".getBytes(UTF_8))
    assert(!raw.isHttp && raw.status === -1 && raw.headers.isEmpty)
    assert(new String(raw.body, UTF_8) === "just bytes")
    // status line with no reason phrase still parses
    val noReason = Warc.splitHttp("HTTP/1.1 404\r\n\r\nx".getBytes(UTF_8))
    assert(noReason.isHttp && noReason.status === 404)
  }

  test("httpResponses: response records explode to (status, headers, body) columns") {
    val html = "<p>Hello</p>"
    val pay = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html).getBytes(UTF_8)
    val blob = Warc.render("response", "<urn:test:1>", "http://t/1", pay) ++
      Warc.render("request", "<urn:test:2>", "http://t/1",
        "GET / HTTP/1.1\r\n\r\n".getBytes(UTF_8)) ++
      Warc.render("response", "<urn:test:3>", "http://t/3", "raw".getBytes(UTF_8))
    val recs = Warc.records(Seq(("mem://f", blob)).toDF("path", "content"))
    val got = Warc.httpResponses(recs)
      .select("record_id", "http_status", "http_body")
      .as[(String, Int, Array[Byte])].collect().sortBy(_._1)
    assert(got.length === 2) // the request record is filtered out
    assert(got(0)._1 === "<urn:test:1>" && got(0)._2 === 200 &&
      new String(got(0)._3, UTF_8) === html)
    assert(got(1)._1 === "<urn:test:3>" && got(1)._2 === -1 &&
      new String(got(1)._3, UTF_8) === "raw")
  }

  test("readStream drains new WARC files incrementally; restart never re-parses history") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("warcstream")
    val ckpt = Files.createTempDirectory("warcstream_ckpt").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(): Unit = {
      val q = Warc.readStream(spark, dir.toString + "/*.warc")
        .select("record_id")
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = batch.as[String].collect()
          seen.synchronized { seen ++= ids }
          ()
        }
        .start()
      q.awaitTermination()
    }
    Files.write(dir.resolve("a.warc"),
      rec(1, "aa".getBytes(UTF_8)) ++ rec(2, "bb".getBytes(UTF_8)))
    drain()
    assert(seen.sorted === Seq("<urn:test:1>", "<urn:test:2>"))
    // second file lands; the restarted AvailableNow query parses ONLY it
    Files.write(dir.resolve("b.warc"), rec(3, "cc".getBytes(UTF_8)))
    drain()
    assert(seen.sorted === Seq("<urn:test:1>", "<urn:test:2>", "<urn:test:3>"))
  }

  test("decompression bombs quarantine at the size cap instead of exhausting heap") {
    val small = Warc.gzipMember(rec(1, "ok".getBytes(UTF_8)))
    // one member whose decompressed size exceeds a tiny per-member cap:
    // quarantined with the cap reason, scan resyncs, later members survive
    val big = Warc.gzipMember(Array.fill[Byte](4096)('x'))
    val rs = Warc.parseAuto(big ++ small, maxDecompressedBytes = 1024L).toSeq
    assert(rs.count(_.valid) === 1 && rs.find(_.valid).get.record_id === "<urn:test:1>")
    assert(rs.exists(r => !r.valid && r.error.contains("decompresses past")))
    // total-output cap: first member fits, the next would push the
    // concatenated output past the cap -> one cap record, parse of the
    // buffered prefix still yields the first record
    val half = Warc.gzipMember(rec(2, Array.fill[Byte](500)('y')))
    val rs2 = Warc.parseAuto(half ++ half, maxDecompressedBytes = 800L).toSeq
    assert(rs2.count(_.valid) === 1)
    assert(rs2.exists(r => !r.valid && r.error.contains("exceeds 800 bytes")))
    // default cap leaves normal files untouched
    assert(Warc.parseAuto(small ++ small).count(_.valid) === 2)
  }
}
