package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.meertrap.Schemas

/** Run-summary JSON source (reference S1/S2/S4,
  * `meertrap/observation/extract.py:22-128`).
  *
  * Spark-first redesign of the reference's thread-pooled per-file loop:
  *   - one distributed `binaryFile` scan of the candidate-directory tree
  *     (recursive glob, like `rglob("*.json")`),
  *   - content-hash dedup BEFORE parsing (the reference MD5s each file and
  *     skips seen hashes, `extract.py:60-77`) — here `md5(content)` +
  *     deterministic keep-first-by-path instead of thread-arrival order,
  *   - `from_json` with the explicit schema; rows that fail to parse land
  *     in a quarantine frame instead of failing the job (per-file fault
  *     tolerance, `extract.py:106-113`).
  *
  * Scale: at 100 TB of small files the binaryFile listing is the bottleneck;
  * production layout would compact bundles into larger containers (or
  * ingest via streaming `Trigger.AvailableNow`). The operator surface is
  * unchanged either way.
  */
object RunSummarySource {

  final case class Result(parsed: DataFrame, corrupt: DataFrame)

  /** Read every `*.json` under `dir` (recursive), dedup by content hash,
    * parse with the declared schema.
    *
    * @return parsed frame (nested columns + `filename` + `md5`) and
    *         quarantine frame of unparseable files (path + raw content).
    */
  def read(spark: SparkSession, dir: String): Result = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("content").cast("string").as("json"))
      .withColumn("md5", md5(col("json")))

    // Deterministic keep-first by path (reference keeps thread-arrival
    // first, which is non-deterministic; path order is stable re-run to
    // re-run and equally valid for idempotency).
    val deduped = graft.operators.Dedup.keepFirst(raw, Seq("md5"), Seq(col("path").asc))

    val parsed = deduped
      .withColumn("rec", from_json(col("json"), Schemas.runSummary))
      .withColumn("filename",
        concat_ws("/",
          regexp_extract(col("path"), "([^/]+)/[^/]+$", 1),
          regexp_extract(col("path"), "([^/]+)\\.json$", 1)))

    Result(
      parsed = parsed.where(col("rec").isNotNull && col("rec.utc_start").isNotNull)
        .select(col("filename"), col("md5"), col("rec.*")),
      corrupt = parsed.where(col("rec").isNull || col("rec.utc_start").isNull)
        .select(col("path"), col("json"))
    )
  }
}
