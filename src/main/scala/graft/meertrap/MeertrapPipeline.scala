package graft.meertrap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Checkpoint, RunSummarySource, SpcclSource}

/** End-to-end MeerTRAP batch pipeline (reference `meertrap/main.py:6-10` +
  * `meertrap/meertrap.py:70-205`): parse -> transform -> (load).
  *
  * Stages are optionally checkpointed to parquet like the reference's
  * `read_or_parse_parquet` (resumability, not just caching).
  */
object MeertrapPipeline {

  final case class Output(
      observation: ObservationTransform.Result,
      candidates: DataFrame,
      corruptRunSummaries: DataFrame,
      quarantinedSpccl: DataFrame)

  /** @param dir          candidate-directory tree (one dir per candidate)
    * @param checkpointDir if set, parse outputs checkpoint here (S5/S6)
    */
  def run(spark: SparkSession, dir: String,
          checkpointDir: Option[String] = None,
          fileRoot: String = "data", partitionKey: String = ""): Output = {
    val runSummaries = RunSummarySource.read(spark, dir)
    val spccl        = SpcclSource.read(spark, dir)

    val flat = checkpointDir match {
      case Some(cp) => Checkpoint.readOrCompute(spark, s"$cp/obs_raw")(
        ObservationTransform.flatten(runSummaries.parsed))
      case None => ObservationTransform.flatten(runSummaries.parsed)
    }

    val obsResult = ObservationTransform.transform(flat)

    // Beam frame keyed for the candidate as-of join: beam rows + their
    // observation start times.
    val obsBeams = obsResult.beam.join(
      obsResult.obs.select(col("`obs.t_min`"), col("observation_id")),
      Seq("observation_id"))

    val cands = CandidateTransform.transform(
      spccl.parsed, obsBeams, fileRoot, partitionKey)

    Output(obsResult, cands, runSummaries.corrupt, spccl.quarantined)
  }

  /** The reference's own smoke query (`README.md:50-54`):
    * `SELECT * FROM sp_candidate LIMIT 1` equivalent.
    */
  def firstSpCandidate(out: Output): DataFrame =
    out.candidates.orderBy(col("sp_candidate_id")).limit(1)

  /** Per-run metrics artifact — the numbers behind the reference's Dagster
    * `plot_cand_obs_count` asset (`pipelines/meertrap/assets.py:55-77`:
    * distinct observations + candidate rows per partition run), extended
    * with rows-per-output and the fault-tolerance counters so a scheduler
    * can alert on quarantine spikes. Eager by design: a metrics emission
    * is an action, like the reference's MaterializeResult.
    */
  def metrics(out: Output): Map[String, Long] = Map(
    "num_obs" -> out.observation.obs.select(col("observation_id")).distinct().count(),
    "num_cands" -> out.candidates.count(),
    "beams" -> out.observation.beam.count(),
    "cands_per_obs_max" -> {
      // candidates carry beam_id; observation attribution goes through the
      // beam frame (broadcast: beams are dimension-sized)
      val top = out.candidates.select(col("beam_id"))
        .join(broadcast(out.observation.beam.select(col("beam_id"), col("observation_id"))),
          Seq("beam_id"))
        .groupBy(col("observation_id"))
        .agg(count(lit(1)).as("n")).agg(max(col("n"))).head()
      if (top.isNullAt(0)) 0L else top.getLong(0)
    },
    "corrupt_run_summaries" -> out.corruptRunSummaries.count(),
    "quarantined_spccl" -> out.quarantinedSpccl.count())
}
