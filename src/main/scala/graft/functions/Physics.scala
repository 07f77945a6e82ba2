package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Observation physics + enum mappings
  * (reference `meertrap/observation/transform.py:249-297`,
  * `observation/constants.py:3-4`).
  */
object Physics {
  val SpeedOfLightMPerS = 299792458.0d
  val MhzToHz           = 1e6

  /** Shortest wavelength bound: c / (cfreq + bw/2) * 1e6 (MHz inputs). */
  def emMin(cfreq: Column, bw: Column): Column =
    lit(SpeedOfLightMPerS) / (cfreq + bw / 2.0d) * MhzToHz

  /** Longest wavelength bound: c / (cfreq - bw/2) * 1e6 (MHz inputs). */
  def emMax(cfreq: Column, bw: Column): Column =
    lit(SpeedOfLightMPerS) / (cfreq - bw / 2.0d) * MhzToHz

  /** npol -> comma-separated polarisation states (F15). */
  def polStates(npol: Column): Column =
    when(npol === 1, "I").when(npol === 4, "I,Q,U,V").otherwise(lit(null))

  /** npol -> IVOA dataproduct type (F15). */
  def dataproductType(npol: Column): Column =
    when(npol === 1, "dynamic spectrum").when(npol === 4, "cube").otherwise(lit(null))
}
