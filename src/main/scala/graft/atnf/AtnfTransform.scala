package graft.atnf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Coordinates
import graft.meertrap.Schemas

/** ATNF known-pulsar catalogue pipeline (reference `atnf/atnf.py:17-94`).
  *
  * The reference pulls the catalogue via the psrqpy HTTP client; the engine
  * surface is "read an external catalogue snapshot as a DataFrame" — here a
  * CSV snapshot (the catalogue is distributed as a downloadable tarball/CSV;
  * zero-egress environment).
  */
object AtnfTransform {

  private def c(n: String): Column = col(s"`$n`")

  /** Extract (`atnf/atnf.py:17-35`): read snapshot, drop `*_ERR`, rename via
    * `query_param_mapping` (`atnf/params.py:3-10`), mint known_pulsar_id,
    * stamp visited_at.
    */
  def extract(spark: SparkSession, csvPath: String, visitedAt: java.sql.Timestamp): DataFrame = {
    val raw = spark.read.option("header", "true").schema(Schemas.atnf).csv(csvPath)
    // Global window — BOUNDED BY CONSTRUCTION: the ATNF catalogue is
    // ~3.5k known pulsars (a reference dataset, not a fact stream).
    // Fact-table paths must use Ids.denseId; do not copy this pattern.
    val w = Window.orderBy(c("known_ps.name"))
    raw
      .select(
        col("NAME").as("known_ps.name"),
        col("RAJ").as("known_ps.ra"),
        col("DECJ").as("known_ps.dec"),
        col("DM").as("known_ps.dm"),
        col("W50").as("known_ps.width"),
        col("P0").as("known_ps.period"))
      .withColumn("known_pulsar_id", row_number().over(w).cast("long"))
      .withColumn("visit.visited_at", lit(visitedAt))
  }

  /** Transform (`atnf/atnf.py:38-77`): HMS/DMS -> degrees, "(ra,dec)"
    * position, catalogue literals.
    */
  def transform(df: DataFrame, catalogueVersion: String = "2.3.0"): DataFrame = df
    .withColumn("known_ps.ra", Coordinates.hmsToDeg(c("known_ps.ra")))
    .withColumn("known_ps.dec", Coordinates.dmsToDeg(c("known_ps.dec")))
    .withColumn("known_ps.pos",
      Coordinates.positionString(c("known_ps.ra").cast("string"),
        c("known_ps.dec").cast("string")))
    .withColumn("cat.name", lit("ATNF"))
    .withColumn("cat.url", lit("https://www.atnf.csiro.au/research/pulsar/psrcat/"))
    .withColumn("cat.version", lit(catalogueVersion))
    .withColumn("catalogue_id", lit(1L))
    .withColumn("catalogue_visit_id", lit(1L))
}
