package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus distributed decode/feature-extract scaffolding.
  *
  * The Spark-side mechanics (schema, partition-sized batching, per-partition
  * decoder amortization) are real and tested; the actual media decoding is
  * STUBBED behind [[MediaCodec]] (no image/audio libraries exist in this
  * container) with a deterministic fake so tests exercise the full path.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  final case class MediaRecord(
      asset_id: Long,
      media_type: String,       // "image" | "audio" | "video"
      payload: Array[Byte],
      source_path: String)

  final case class MediaFeatures(
      asset_id: Long,
      media_type: String,
      byte_len: Long,
      sha_fingerprint: Long,
      width: Int,               // stub-decoded
      height: Int,              // stub-decoded
      feature: Array[Float])    // stub feature vector

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * codec (???-equivalent, clearly marked). The call signature and batch
    * shape match what a JNI/javax.imageio decoder would need: one codec
    * instance per PARTITION (expensive init amortized), records streamed
    * through it.
    */
  object MediaCodec {
    final case class Decoded(width: Int, height: Int, feature: Array[Float])

    /** Real implementation would decode `payload`; the fake derives
      * deterministic dimensions + a 8-dim feature from the bytes.
      */
    def decode(payload: Array[Byte]): Decoded = {
      val h = payload.foldLeft(1469598103934665603L)((a, b) => (a ^ b) * 1099511628211L)
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      val feat = Array.tabulate(8)(i => math.floorMod(h >> (i * 7), 1000) / 1000.0f)
      Decoded(w, ht, feat)
    }
  }

  /** Read a directory of media files as MediaRecords — binaryFile scan, the
    * same distributed source the run summaries use.
    */
  def readMediaDir(spark: SparkSession, dir: String, glob: String, mediaType: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        xxhash64(col("path")).as("asset_id"),
        lit(mediaType).as("media_type"),
        col("content").as("payload"),
        col("path").as("source_path"))

  /** Distributed decode + feature extraction: mapPartitions so decoder init
    * happens once per partition, rows stream through without materializing
    * the partition (the Scala analogue of `mapInPandas` batch processing).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (JNI context, model, ...)
      it.map { r =>
        val d = MediaCodec.decode(r.payload)
        MediaFeatures(r.asset_id, r.media_type, r.payload.length.toLong,
          r.payload.foldLeft(0L)((a, b) => a * 31 + b), d.width, d.height, d.feature)
      }
    }
  }

  /** Frame/chunk sampling plumbing: split a payload into fixed-size chunks
    * (video frame extraction stand-in) — explode keeps it distributed, chunk
    * index is carried for downstream ordering.
    */
  def sampleChunks(media: DataFrame, chunkBytes: Int, everyNth: Int): DataFrame = {
    val nChunks = ceil(length(col("payload")).cast("double") / chunkBytes).cast("int")
    media
      .withColumn("chunk_idx",
        explode(sequence(lit(0), greatest(nChunks - 1, lit(0)), lit(everyNth))))
      .select(col("asset_id"), col("media_type"), col("chunk_idx"),
        col("payload").substr(col("chunk_idx") * chunkBytes + 1, lit(chunkBytes))
          .as("chunk"))
  }
}
