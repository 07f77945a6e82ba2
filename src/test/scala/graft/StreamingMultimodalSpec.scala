package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.streaming.IncrementalRunner

class StreamingMultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("incremental run-summary ingestion drains the directory with AvailableNow") {
    val root = graft.meertrap.FixtureGen.generate()
    val cp   = Files.createTempDirectory("graft_stream_cp").toString
    var total = 0L
    val q = IncrementalRunner.runSummaries(spark, root.toString, cp,
      (batch, _) => total += batch.count())
    q.awaitTermination(120000)
    // 6 json files, 1 corrupt -> 5 parsed rows (content dedup is a batch
    // concern; the stream dedups at transform time like the reference re-runs)
    assert(total === 5)
  }

  test("windowed event aggregation (batch-mode check of the streaming plan)") {
    val ev = Tables(spark, sf("sf0.001"), "events")
    val agg = IncrementalRunner.windowedEventCounts(ev, "1 hour", "1 hour", "1 hour")
    val n = agg.agg(sum("n")).head().getLong(0)
    assert(n === ev.count())
  }

  test("multimodal: features extracted per partition with stub codec") {
    val media = (1L to 10L).map(i =>
      Multimodal.MediaRecord(i, "image", Array.fill(100 + i.toInt)(i.toByte), s"mem://$i"))
      .toDS()
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 10)
    assert(feats.forall(_.feature.length === 8))
    assert(feats.forall(f => f.width >= 64 && f.height >= 64))
    // determinism: same payload -> same features
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.sortBy(_.asset_id).map(_.sha_fingerprint).toSeq ===
      again.sortBy(_.asset_id).map(_.sha_fingerprint).toSeq)
  }

  test("multimodal: binaryFile dir scan -> typed records -> features, end to end") {
    val dir = Files.createTempDirectory("media")
    (1 to 5).foreach { i =>
      Files.write(dir.resolve(s"img_$i.png"), Array.fill(50 * i)(i.toByte))
    }
    Files.writeString(dir.resolve("notes.txt"), "not an image")
    val media = Multimodal.readMediaDir(spark, dir.toString, "*.png", "image")
    assert(media.count() === 5)                        // glob excluded the txt
    val feats = Multimodal.extractFeatures(media.as[Multimodal.MediaRecord]).collect()
    assert(feats.length === 5)
    assert(feats.map(_.byte_len).sorted.toSeq === Seq(50L, 100L, 150L, 200L, 250L))
    assert(feats.map(_.asset_id).distinct.length === 5)
  }

  test("multimodal: chunk sampling splits payloads distributively") {
    val media = Seq((1L, "video", Array.fill(1000)(7.toByte)))
      .toDF("asset_id", "media_type", "payload")
    val chunks = Multimodal.sampleChunks(media, chunkBytes = 256, everyNth = 1).collect()
    assert(chunks.length === 4)   // ceil(1000/256)
    assert(chunks.map(_.getAs[Array[Byte]]("chunk").length).toSeq === Seq(256, 256, 256, 232))
  }
}
