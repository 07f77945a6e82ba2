package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._

/** The full training-data RELEASE workflow as a public API — the
  * composition a user runs before shipping a corpus, each stage one of
  * this library's individually-verified operators:
  *
  *   1. PII scrub            ([[Pii.redact]] — map-side projection)
  *   2. quality battery      ([[TextStats.gopherVerdicts]])
  *   3. exact + near dedup   ([[Dedup.exactByFingerprint]] +
  *                            LSH pairs → connected components)
  *   4. dup-span removal     ([[TextStats.removeDupSpans]] — Lee et al.
  *                            removal; fully-covered docs drop out)
  *   5. decontamination      ([[Decontaminate.clean]] vs a benchmark set)
  *   6. LM-score floor       ([[LmScore]] unigram mean-logprob quantile)
  *   7. sequence packing     ([[Packing.packChunks]] — span assignment)
  *
  * Every stage is a scan or a keyed shuffle (see SCALE.md per family);
  * the composition adds no operator of its own, so the 100 TB story is
  * the stages'. `ReleasePipelineSpec` pins the stage contracts compose
  * (counts monotone, packed spans tile the surviving stream exactly).
  */
object ReleasePipeline {

  final case class Config(
      textCol: String = "text",
      idCol: String = "doc_id",
      nearDupThreshold: Double = 0.9,
      shingleN: Int = 3,
      spanK: Int = 5,
      decontaminateN: Int = 3,
      lmFloorQuantile: Double = 0.1,
      oovLogp: Double = -12.0,
      packCapacity: Long = 512L)

  final case class Stats(
      input: Long,
      afterQuality: Long,
      afterDedup: Long,
      afterDespan: Long,
      afterDecontaminate: Long,
      afterLmFloor: Long)

  /** `corpus`: the surviving (id, text) stream (text fully scrubbed);
    * `packed`: its packing assignment at `packCapacity`.
    */
  final case class Result(corpus: DataFrame, packed: DataFrame, stats: Stats)

  /** Run the release workflow. `benchmark` is the evaluation set to
    * decontaminate against (its text column is `cfg.textCol`).
    */
  def run(docs: DataFrame, benchmark: DataFrame,
          cfg: Config = Config()): Result = {
    val id = col(s"`${cfg.idCol}`")
    val input = docs.where(col(s"`${cfg.textCol}`").isNotNull)

    // 1. PII scrub — pure projection, row count unchanged.
    val scrubbed = input.select(id.as("doc_id"),
      Pii.redact(col(s"`${cfg.textCol}`")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 2. Gopher-style quality battery.
    val qualified = scrubbed.join(
      TextStats.gopherVerdicts(scrubbed, "text", "doc_id")
        .where(col("pass")).select(col("id").as("doc_id")), "doc_id")

    // 3. Exact dedup, then LSH near-dup clusters (keep cluster-min id).
    val exact = Dedup.exactByFingerprint(qualified, "text", "doc_id")
    val drops = Dedup.connectedComponents(
        Dedup.minhashLshPairs(exact, "text", "doc_id",
          shingleN = cfg.shingleN, threshold = cfg.nearDupThreshold))
      .where(col("id") =!= col("label")).select("id")
    val deduped = exact.join(drops, exact("doc_id") === drops("id"), "left_anti")

    // 4. Exact-substring scrub: REMOVE corpus-duplicated spans and drop
    // docs scrubbed to nothing (the paper's degenerate case).
    val despanned = TextStats.removeDupSpans(deduped, "text", "doc_id",
        k = cfg.spanK)
      .where(col("n_kept") > 0)
      .select(col("id").as("doc_id"), col("scrubbed").as("text"))

    // 5. Decontaminate against the benchmark.
    val clean = Decontaminate.clean(despanned, "text", "doc_id",
      benchmark.where(col(s"`${cfg.textCol}`").isNotNull)
        .select(col(s"`${cfg.textCol}`").as("text")), "text",
      n = cfg.decontaminateN)

    // 6. Unigram-LM floor: drop the lowest-scoring quantile.
    val uni = LmScore.trainUnigram(clean, "text")
    val scored = LmScore.scoreDocs(clean, "text", "doc_id", uni, cfg.oovLogp)
    val cut = scored
      .agg(expr(s"approx_percentile(mean_logp, ${cfg.lmFloorQuantile})"))
      .head().getDouble(0)
    val kept = clean.join(
        scored.where(col("mean_logp") >= cut).select(col("id").as("doc_id")),
        "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 7. Packing assignment over the survivors.
    val sized = kept.select(col("doc_id"),
      graft.functions.TextFns.tokenCount(col("text")).cast("long").as("len"))
    val packed = Packing.packChunks(sized, "doc_id", "len", cfg.packCapacity)

    val stats = Stats(
      input = input.count(),
      afterQuality = qualified.count(),
      afterDedup = deduped.count(),
      afterDespan = despanned.count(),
      afterDecontaminate = clean.count(),
      afterLmFloor = kept.count())
    // Stage counts above consumed both caches; release after the action
    // that consumes the returned frames (build-then-run-once pattern).
    graft.core.Frames.releaseAfterNextAction(docs.sparkSession, scrubbed, kept)
    Result(kept, packed, stats)
  }
}
