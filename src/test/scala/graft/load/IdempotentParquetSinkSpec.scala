package graft.load

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSuite

class IdempotentParquetSinkSpec extends SparkSuite {
  import spark.implicits._

  test("batch retries do not duplicate rows; partial writes stay invisible") {
    val sink = new IdempotentParquetSink(
      Files.createTempDirectory("idem_sink").toString + "/t")

    assert(sink.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), batchId = 0L))
    assert(sink.append(Seq((3L, "c")).toDF("id", "v"), batchId = 1L))
    // at-least-once delivery: batch 1 re-executes -> skipped, no dup rows
    assert(!sink.append(Seq((3L, "c")).toDF("id", "v"), batchId = 1L))
    assert(sink.read(spark).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // a crashed attempt: data dir written but no marker -> reader ignores it
    Seq((99L, "zz")).toDF("id", "v")
      .write.mode("overwrite").parquet(sink.root + "/data/batch=7")
    assert(sink.read(spark).where(col("id") === 99L).count() === 0L)
    // the retry of that batch overwrites the partial and commits once
    assert(sink.append(Seq((4L, "d")).toDF("id", "v"), batchId = 7L))
    val all = sink.read(spark).orderBy("id").as[(Long, String)].collect().toSeq
    assert(all === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("streaming wire: AvailableNow + foreachBatch into the sink, restart-safe") {
    val dir = Files.createTempDirectory("idem_docs")
    val cp  = Files.createTempDirectory("idem_cp").toString
    val sink = new IdempotentParquetSink(
      Files.createTempDirectory("idem_out").toString + "/t")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").write.parquet(dir.toString + "/p1")

    def drain(): Unit = {
      val q = spark.readStream.schema("id LONG, v STRING")
        .option("recursiveFileLookup", "true").parquet(dir.toString)
        .writeStream.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          sink.append(b, id); ()
        }
        .start()
      q.awaitTermination(120000)
    }
    drain()
    // a second drain with no new data re-delivers nothing; counts stable
    drain()
    assert(sink.read(spark).count() === 2L)
    Seq((3L, "z")).toDF("id", "v").write.parquet(dir.toString + "/p2")
    drain()
    assert(sink.read(spark).orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("compaction: content invariant, markers survive, appends continue, repeatable") {
    val sink = new IdempotentParquetSink(
      Files.createTempDirectory("idem_cmp").toString + "/t")
    def rows = sink.read(spark).orderBy("id").as[(Long, String)].collect().toSeq

    assert(!sink.compact(spark)) // empty: nothing to merge
    assert(sink.append(Seq((1L, "a")).toDF("id", "v"), 0L))
    assert(!sink.compact(spark)) // one live dir: still nothing to merge
    assert(sink.append(Seq((2L, "b")).toDF("id", "v"), 1L))
    assert(sink.append(Seq((3L, "c")).toDF("id", "v"), 2L))
    val before = rows
    assert(sink.compact(spark))
    assert(rows === before)
    // re-delivered pre-compaction batch id still skips (markers survive)
    assert(!sink.append(Seq((1L, "dup")).toDF("id", "v"), 0L))
    assert(rows === before)
    // appends continue past the watermark; a second compaction folds the
    // old compaction + the new batch into one directory again
    assert(sink.append(Seq((4L, "d")).toDF("id", "v"), 3L))
    assert(rows === before :+ (4L, "d"))
    assert(sink.compact(spark))
    assert(rows === before :+ (4L, "d"))
    assert(!sink.compact(spark)) // single compacted dir: no-op
    // and the sink still accepts new batches afterwards
    assert(sink.append(Seq((5L, "e")).toDF("id", "v"), 4L))
    assert(rows === before ++ Seq((4L, "d"), (5L, "e")))
  }

  test("compaction reclaims dirs orphaned by a crash between marker and deletes") {
    val root = Files.createTempDirectory("idem_orph").toString + "/t"
    val sink = new IdempotentParquetSink(root)
    def rows = sink.read(spark).orderBy("id").as[(Long, String)].collect().toSeq

    assert(sink.append(Seq((1L, "a")).toDF("id", "v"), 0L))
    assert(sink.append(Seq((2L, "b")).toDF("id", "v"), 1L))
    assert(sink.compact(spark)) // watermark upto=1
    assert(sink.append(Seq((3L, "c")).toDF("id", "v"), 2L))
    // simulate the crash: a later compaction wrote its data AND marker
    // but died before its deletes — recreate the superseded dirs it
    // would have left behind
    Seq((1L, "a")).toDF("id", "v")
      .write.mode("overwrite").parquet(root + "/data/batch=0")
    val before = rows
    assert(sink.compact(spark)) // watermark upto=2, sweep runs
    assert(rows === before)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)
    // everything below the new watermark is reclaimed: the old
    // compaction dir, the crash-orphaned batch dir, the folded batch
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root + "/compact/upto=1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root + "/data/batch=0")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root + "/data/batch=2")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(root + "/compact/upto=2")))
    // markers survive: re-delivered old ids still skip
    assert(!sink.append(Seq((9L, "dup")).toDF("id", "v"), 0L))
    assert(rows === before)
  }
}
