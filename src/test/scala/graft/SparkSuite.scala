package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session per suite (one JVM-wide session, reused). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession =
    Sessions.init(Sessions.builder("local[4]", 4).appName("graft-test").getOrCreate())

  def sf(dir: String): String = s"/root/testdata/$dir"
}
