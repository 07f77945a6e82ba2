package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

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
}
