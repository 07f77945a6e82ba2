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
}
