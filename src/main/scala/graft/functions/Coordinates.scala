package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Native-Column coordinate conversions.
  *
  * Replaces the reference's per-row astropy `SkyCoord` UDF
  * (`src/ska_src_maltopuft_etl/utils/coordinate.py:7-19`) with pure Catalyst
  * expressions so the conversion stays inside whole-stage codegen. Results
  * are rounded to 5 decimal places ("nearest arcsecond") to match the
  * reference exactly.
  */
object Coordinates {

  /** "h:m:s[.frac]" (hourangle) -> decimal degrees, rounded to 5 dp.
    * E.g. "4:40:17.07" -> 70.07113.
    */
  def hmsToDeg(c: Column): Column = {
    val p = split(trim(c), ":")
    val h = element_at(p, 1).cast("double")
    val m = element_at(p, 2).cast("double")
    val s = element_at(p, 3).cast("double")
    round((h + m / 60.0 + s / 3600.0) * 15.0, 5)
  }

  /** "[±]d:m:s[.frac]" (degrees) -> decimal degrees, rounded to 5 dp.
    * Sign comes from the leading '-' of the *string* (so "-0:30:00" is
    * correctly negative even though the degrees field parses as -0).
    */
  def dmsToDeg(c: Column): Column = {
    val t    = trim(c)
    val sign = when(substring(t, 1, 1) === "-", -1.0d).otherwise(1.0d)
    val p    = split(t, ":")
    val d    = abs(element_at(p, 1).cast("double"))
    val m    = element_at(p, 2).cast("double")
    val s    = element_at(p, 3).cast("double")
    round(sign * (d + m / 60.0 + s / 3600.0), 5)
  }

  /** "(ra,dec)" position string (reference `utils/coordinate.py:22-24` +
    * `candidate/transform.py:193-197`).
    */
  def positionString(ra: Column, dec: Column): Column =
    format_string("(%s,%s)", ra, dec)
}
