package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `classic.Dataset.ofRows` (private[sql]) so graft can build
  * DataFrames from custom logical plans (the as-of join node). This is the
  * standard extension-library pattern for planting custom operators.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
