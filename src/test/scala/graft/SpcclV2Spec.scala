package graft

import org.apache.spark.sql.functions._
import graft.sources.SpcclSource

/** DataSourceV2 SPCCL connector: parity with the V1 composition, column
  * pruning reaching the parser, filter pushdown into the reader.
  */
class SpcclV2Spec extends SparkSuite {
  import spark.implicits._

  private lazy val root = graft.meertrap.FixtureGen.generate().toString
  private def v2 = spark.read.format("graft.sources.v2.SpcclDataSource").load(root)

  test("V2 scan equals the V1 parsed frame (same rows, single-line rule)") {
    val v1 = SpcclSource.read(spark, root).parsed
    val cols = v1.columns.sorted.map(col).toSeq
    val a = v1.select(cols: _*).orderBy("filename").collect().toSeq
    val b = v2.select(cols: _*).orderBy("filename").collect().toSeq
    assert(v2.columns.sorted.toSeq === v1.columns.sorted.toSeq)
    assert(a === b)                    // incl. 2-line file skipped by both
  }

  test("filter pushdown reaches the reader (PushedFilters in scan description)") {
    val df = v2.where(col("snr") > 11.0 && col("beam_mode") === "C")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("PushedFilters"))
    assert(desc.contains("GreaterThan(snr,11.0)"), desc.linesIterator.find(_.contains("PushedFilters")).getOrElse(""))
    assert(desc.contains("EqualTo(beam_mode,C)"))
    // results still correct (pushed filters are also re-checked by Spark)
    val v1 = SpcclSource.read(spark, root).parsed
      .where(col("snr") > 11.0 && col("beam_mode") === "C")
    assert(df.count() === v1.count())
  }

  test("column pruning reaches the parser (ReadSchema shrinks)") {
    val df = v2.select("snr", "dm")
    val desc = df.queryExecution.executedPlan.toString
    val line = desc.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(line.contains("snr") && line.contains("dm"))
    assert(!line.contains("plot_file") && !line.contains("beam_mode"))
    val vals = df.orderBy("snr").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(vals.length === 5)          // 5 parseable single-line files
  }

  test("micro-batch stream drains the archive, then picks up only new files") {
    import java.nio.file.{Files, Paths}
    // fresh fixture — this test appends files, the suite's shared root
    // must stay untouched for the other assertions
    val streamRoot = graft.meertrap.FixtureGen.generate().toString
    val cp = Files.createTempDirectory("spccl_v2_cp").toString
    def drainOnce(): Long = {
      var total = 0L
      val q = spark.readStream.format("graft.sources.v2.SpcclDataSource")
        .load(streamRoot)
        .writeStream
        .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) =>
          total += batch.count())
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      total
    }
    assert(drainOnce() === 5)          // all current single-line files

    // Append a new candidate dir whose path sorts AFTER the processed ones
    // (the source's monotonic-naming contract; MeerTRAP dirs embed a unix
    // timestamp). Only the new file arrives in the next drain.
    val dir = Paths.get(streamRoot, "zz_tpn-9-99_1800000000")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("9999_spccl.log"),
      "1\t60000.5\t99.5\t4.0\t12.5\t7\tC\t04:37:15.99\t-47:15:09.7\t1\t0.9\tf.fil\tp.jpg\n")
    assert(drainOnce() === 1)
    // re-drain with nothing new: zero rows
    assert(drainOnce() === 0)
  }

  test("malformed numeric cells null the VALUE; CRLF files parse cleanly") {
    import java.nio.file.{Files, Paths}
    val r = graft.meertrap.FixtureGen.generate().toString
    // dm (pos 2) unparseable; snr (pos 4) fine; CRLF line endings, whose \r
    // must not corrupt the last cell (plot_file).
    val dir = Paths.get(r, "tpn-bad-1_1700000001")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("7777_spccl.log"),
      "1\t60000.5\tNOT_A_NUMBER\t4.25\t12.5\t7\tC\t04:37:15.99\t-47:15:09.7\t1\t0.9\tf.fil\tp.jpg\r\n")
    val df = spark.read.format("graft.sources.v2.SpcclDataSource").load(r)
      .where(col("filename").contains("7777"))
    val row = df.select("dm", "snr", "plot_file").collect()
    assert(row.length === 1)                       // scan survived the cell
    assert(row(0).isNullAt(0))                     // dm -> null
    assert(row(0).getDouble(1) === 12.5)           // snr intact
    assert(row(0).getString(2).endsWith("p.jpg"))  // no trailing \r
  }

  test("stream fails loudly when the archive violates the append-only contract") {
    import java.nio.file.{Files, Paths}
    val streamRoot = graft.meertrap.FixtureGen.generate().toString
    val cp = Files.createTempDirectory("spccl_v2_cp_viol").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft.sources.v2.SpcclDataSource")
        .load(streamRoot)
        .writeStream
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    drain()  // commits offset n=5 pinned to the last sorted path
    // Delete one processed file: the re-listed position of the pinned path
    // shifts, which MUST fail the next batch instead of double-reading.
    val victim = Files.walk(Paths.get(streamRoot)).iterator()
      .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    val toDelete = scala.jdk.CollectionConverters.IteratorHasAsScala(victim)
      .asScala.filter(p => p.toString.contains("spccl") && Files.isRegularFile(p))
      .toSeq.sortBy(_.toString).head
    Files.delete(toDelete)
    // New file so latestOffset moves and a batch is actually planned.
    val dir = Paths.get(streamRoot, "zz_tpn-9-99_1800000001")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("8888_spccl.log"),
      "1\t60000.5\t99.5\t4.0\t12.5\t7\tC\t04:37:15.99\t-47:15:09.7\t1\t0.9\tf.fil\tp.jpg\n")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { drain() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage).exists(_.contains("append-only"))))
  }

  test("V2 write: round-trip (write -> read) reproduces the source frame") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("spccl_v2_write").toString
    v2.write.format("graft.sources.v2.SpcclDataSource").mode("append").save(out)
    val back = spark.read.format("graft.sources.v2.SpcclDataSource").load(out)
    val cols = v2.columns.sorted.map(col).toSeq
    assert(back.select(cols: _*).orderBy("filename").collect().toSeq ===
      v2.select(cols: _*).orderBy("filename").collect().toSeq)
    // one single-line file per row, archive layout preserved
    assert(back.count() === v2.count())
    // no staging debris survives the commit
    assert(!Files.exists(java.nio.file.Paths.get(out, "_temporary")) ||
      Files.list(java.nio.file.Paths.get(out, "_temporary")).count() === 0)
  }

  test("V2 write: rows that would break the one-line TSV contract are quarantined") {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory("spccl_v2_wq").toString
    val rows = Seq(
      ("good/cand1.spccl", 60000.5, 4.0, 1.5, 12.5, 7, "C", "04:37", "-47:15", 1, 0.9, "f.fil", "p.jpg"),
      ("bad/cand2.spccl", 60000.6, 4.1, 1.5, 12.6, 7, "C", "04:38", "evil\tdec", 1, 0.9, "f.fil", "p.jpg"))
      .toDF("filename", "mjd", "dm", "width", "snr", "beam", "beam_mode",
        "ra", "dec", "label", "probability", "fil_file", "plot_file")
    rows.write.format("graft.sources.v2.SpcclDataSource").mode("append").save(out)
    // scan sees only the clean row; the dirty one sits under _quarantine
    val back = spark.read.format("graft.sources.v2.SpcclDataSource").load(out)
    assert(back.select("filename").as[String].collect().toSeq === Seq("good/cand1.spccl"))
    assert(Files.exists(Paths.get(out, "_quarantine/bad/cand2.spccl.log")))
  }

  test("V2 write: duplicate filename keys in one batch fail the commit (no silent last-writer-wins)") {
    import java.nio.file.{Files, Paths}
    val out = Files.createTempDirectory("spccl_v2_dup").toString
    // Two DIFFERENT rows mapping to the SAME final path: the idempotent
    // exists/delete in commit must not mask this as a quiet overwrite.
    val rows = Seq(
      ("same/cand.spccl", 60000.5, 4.0, 1.5, 12.5, 7, "C", "04:37", "-47:15", 1, 0.9, "f.fil", "p.jpg"),
      ("same/cand.spccl", 60000.6, 4.1, 1.5, 12.6, 8, "C", "04:38", "-47:16", 1, 0.8, "f.fil", "p.jpg"))
      .toDF("filename", "mjd", "dm", "width", "snr", "beam", "beam_mode",
        "ra", "dec", "label", "probability", "fil_file", "plot_file")
    val e = intercept[Exception] {
      rows.repartition(2).write.format("graft.sources.v2.SpcclDataSource")
        .mode("append").save(out)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("duplicate filename keys"))))
    // the commit aborted: nothing (clean or staged) survives at the target
    assert(!Files.exists(Paths.get(out, "same")))
    assert(!Files.exists(Paths.get(out, "_temporary")) ||
      Files.list(Paths.get(out, "_temporary")).count() === 0)
  }

  test("V2 streaming sink: archive-to-archive stream write is readable and complete") {
    import java.nio.file.Files
    val srcRoot = graft.meertrap.FixtureGen.generate().toString
    val out = Files.createTempDirectory("spccl_v2_sink").toString
    val cp = Files.createTempDirectory("spccl_v2_sink_cp").toString
    val q = spark.readStream.format("graft.sources.v2.SpcclDataSource").load(srcRoot)
      .writeStream.format("graft.sources.v2.SpcclDataSource")
      .option("path", out)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val back = spark.read.format("graft.sources.v2.SpcclDataSource").load(out)
    val src = spark.read.format("graft.sources.v2.SpcclDataSource").load(srcRoot)
    val cols = src.columns.sorted.map(col).toSeq
    assert(back.select(cols: _*).orderBy("filename").collect().toSeq ===
      src.select(cols: _*).orderBy("filename").collect().toSeq)
  }

  test("file-level single-line quarantine semantics match the reference") {
    // FixtureGen plants one 2-line spccl file; V2 skips it silently
    // (V1 quarantines it — both exclude it from parsed rows).
    assert(v2.count() === 5)
    assert(SpcclSource.read(spark, root).quarantined.count() === 1)
  }
}
