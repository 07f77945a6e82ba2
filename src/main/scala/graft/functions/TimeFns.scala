package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time/date conversions used across the pipelines. */
object TimeFns {

  /** MJD 40587.0 == 1970-01-01T00:00:00Z (Unix epoch). */
  val MjdUnixEpoch = 40587.0d

  /** Modified Julian Date (float days) -> UTC timestamp.
    *
    * Replaces the reference's astropy `Time(mjd, format="mjd").isot` UDF
    * (`meertrap/candidate/transform.py:71-84`) with pure arithmetic: the
    * astropy UTC scale is identical to this linear map for the relevant era.
    * Microsecond-precision via unix_micros.
    */
  def mjdToTimestamp(mjd: Column): Column =
    timestamp_micros(round((mjd - MjdUnixEpoch) * 86400.0d * 1e6).cast("long"))

  /** Round a timestamp to the nearest second, half-up — Polars
    * `dt.round("1s")` semantics (`candidate/transform.py:113-119`).
    * Spark's `date_trunc` floors, so shift by +500ms first.
    */
  def roundToSecond(ts: Column): Column =
    timestamp_seconds(floor((unix_micros(ts) + lit(500000L)) / lit(1000000L)).cast("long"))

  /** Timestamp + seconds (fractional ok) — reference
    * `start_at + pl.duration(seconds=…)` (`observation/transform.py:148-151`).
    */
  def plusSeconds(ts: Column, secs: Column): Column =
    timestamp_micros(unix_micros(ts) + round(secs * 1e6).cast("long"))
}
