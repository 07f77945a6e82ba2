package graft.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Target-table metadata (reference `core/target.py:11-57`
  * `TargetInformation`) — declared statically instead of introspected from a
  * live DB; the shape (table, prefix, PK, unique constraint, FKs) is
  * identical.
  */
final case class TargetInfo(
    table: String,
    prefix: String,
    primaryKey: String,
    uniqueConstraint: Seq[String],
    foreignKeys: Seq[String])

object Targets {

  private def c(n: String): Column = col(s"`$n`")

  /** The 9 MeerTRAP targets in FK-dependency order
    * (`meertrap/meertrap.py:173-197`) + 3 ATNF targets
    * (`atnf/targets.py:7-20`).
    */
  val meertrap: Seq[TargetInfo] = Seq(
    TargetInfo("schedule_block", "sb.", "schedule_block_id",
      Seq("start_at", "est_end_at"), Nil),
    TargetInfo("meerkat_schedule_block", "mk_sb.", "meerkat_schedule_block_id",
      Seq("meerkat_id"), Seq("schedule_block_id")),
    TargetInfo("host", "host.", "host_id",
      Seq("ip_address", "hostname", "port"), Nil),
    TargetInfo("coherent_beam_config", "cb.", "coherent_beam_config_id",
      Seq("angle", "fraction_overlap", "x", "y"), Nil),
    TargetInfo("observation", "obs.", "observation_id",
      Seq("t_min"), Seq("schedule_block_id", "coherent_beam_config_id")),
    TargetInfo("tiling_config", "tiling.", "tiling_config_id",
      Seq("epoch", "method", "nbeams"), Seq("observation_id")),
    TargetInfo("beam", "beam.", "beam_id",
      Seq("number", "coherent", "ra", "dec"), Seq("observation_id", "host_id")),
    TargetInfo("candidate", "cand.", "candidate_id",
      Seq("dm", "snr", "ra", "dec", "observed_at"), Seq("beam_id")),
    TargetInfo("sp_candidate", "sp_cand.", "sp_candidate_id",
      Seq("plot_path"), Seq("candidate_id"))
  )

  val atnf: Seq[TargetInfo] = Seq(
    TargetInfo("catalogue", "cat.", "catalogue_id", Seq("name"), Nil),
    TargetInfo("catalogue_visit", "visit.", "catalogue_visit_id",
      Seq("visited_at"), Seq("catalogue_id")),
    TargetInfo("known_pulsar", "known_ps.", "known_pulsar_id",
      Seq("name"), Seq("catalogue_id"))
  )

  /** Target-view projection (reference P2, `core/database_loader.py:27-67`):
    * keep `prefix`-ed columns + PK + FKs, strip the prefix so names match DB
    * columns, distinct on the PK (entity frames may arrive denormalized).
    */
  def targetView(df: DataFrame, t: TargetInfo): DataFrame = {
    val prefixed = df.columns.filter(_.startsWith(t.prefix))
    val keyCols  = (t.primaryKey +: t.foreignKeys).filter(df.columns.contains)
    val renamed = df.select((prefixed ++ keyCols).distinct.map(c): _*)
    val stripped = prefixed.foldLeft(renamed) { (acc, p) =>
      acc.withColumnRenamed(p, p.stripPrefix(t.prefix))
    }
    stripped.dropDuplicates(Seq(t.primaryKey).filter(stripped.columns.contains))
  }
}
