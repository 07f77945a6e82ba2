package graft.meertrap

import org.apache.spark.sql.types._

/** Explicit source schemas for the MeerTRAP archive formats.
  *
  * Run summary: nested JSON per `observation/models.py:13-356` in the
  * reference — but unlike the reference (which stringifies variable-length
  * nested lists for a fixed-width frame, `models.py:42-62`, rationale
  * `docs/src/pages/meertrap.rst:71-77`), we keep the real nested
  * ArrayType(StructType): Spark's Parquet/JSON handle nested schemas
  * natively, so the stringify -> literal_eval round trip disappears.
  *
  * All schemas are declared (never inferred) — nullable `utc_stop` and
  * per-file fault tolerance demand it (`observation/extract.py:115-121`).
  */
object Schemas {

  val tilingType: StructType = StructType(Seq(
    StructField("coordinate_type", StringType),
    StructField("epoch", DoubleType),
    StructField("epoch_offset", DoubleType),
    StructField("method", StringType),
    StructField("nbeams", IntegerType),
    StructField("overlap", DoubleType),
    StructField("reference_frequency", DoubleType),
    StructField("shape", StringType),
    StructField("target", StringType)
  ))

  val hostBeamType: StructType = StructType(Seq(
    StructField("absnum", IntegerType),
    StructField("coherent", BooleanType),
    StructField("dec_dms", StringType),
    StructField("mc_ip", StringType),
    StructField("mc_port", IntegerType),
    StructField("ra_hms", StringType),
    StructField("relnum", IntegerType),
    StructField("source", StringType)
  ))

  /** Run-summary JSON (`docs/src/pages/meertrap.rst:112-335`). The opaque
    * `pipeline` / `version_info` objects are intentionally omitted (the
    * reference stringifies and never uses them downstream).
    */
  val runSummary: StructType = StructType(Seq(
    StructField("beams", StructType(Seq(
      StructField("ca_target_request", StructType(Seq(
        StructField("beams", ArrayType(StringType)),
        StructField("tilings", ArrayType(tilingType)),
        StructField("unique_id", StringType)
      ))),
      StructField("cb_antennas", ArrayType(StringType)),
      StructField("coherent_beam_shape", StructType(Seq(
        StructField("angle", DoubleType),
        StructField("overlap", DoubleType),
        StructField("x", DoubleType),
        StructField("y", DoubleType)
      ))),
      StructField("ib_antennas", ArrayType(StringType)),
      StructField("list", ArrayType(hostBeamType))
    ))),
    StructField("data", StructType(Seq(
      StructField("bw", DoubleType),
      StructField("cfreq", DoubleType),
      StructField("nbeam", IntegerType),
      StructField("nbit", IntegerType),
      StructField("nchan", IntegerType),
      StructField("npol", IntegerType),
      StructField("sync_time", DoubleType),
      StructField("tsamp", DoubleType)
    ))),
    StructField("sb_details", StructType(Seq(
      StructField("id", LongType),
      StructField("id_code", StringType),
      StructField("actual_start_time", StringType),
      StructField("expected_duration_seconds", LongType),
      StructField("proposal_id", StringType),
      StructField("script_profile_config", StringType),
      StructField("targets", StringType)
    ))),
    StructField("utc_start", StringType),
    StructField("utc_stop", StringType)
  ))

  /** SPCCL single-line TSV, positional (`candidate/models.py:6-96`,
    * `docs/src/pages/meertrap.rst:46-62`). Element 0 is a discarded index.
    */
  val spccl: StructType = StructType(Seq(
    StructField("index", LongType),
    StructField("mjd", DoubleType),
    StructField("dm", DoubleType),
    StructField("width", DoubleType),
    StructField("snr", DoubleType),
    StructField("beam", IntegerType),
    StructField("beam_mode", StringType),
    StructField("ra", StringType),
    StructField("dec", StringType),
    StructField("label", IntegerType),
    StructField("probability", DoubleType),
    StructField("fil_file", StringType),
    StructField("plot_file", StringType)
  ))

  /** ATNF catalogue snapshot columns kept after `*_ERR` drop
    * (`atnf/params.py:3-10`, `atnf/atnf.py:29`).
    */
  val atnf: StructType = StructType(Seq(
    StructField("NAME", StringType),
    StructField("RAJ", StringType),
    StructField("DECJ", StringType),
    StructField("DM", DoubleType),
    StructField("W50", DoubleType),
    StructField("P0", DoubleType)
  ))
}
