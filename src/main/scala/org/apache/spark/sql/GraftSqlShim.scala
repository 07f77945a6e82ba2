package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `classic.Dataset.ofRows` (private[sql]) so graft can build
  * DataFrames from custom logical plans (the as-of join node). This is the
  * standard extension-library pattern for planting custom operators.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column <-> Expression bridges (private[sql] in Spark 4) — needed for
    * expressions that carry non-literal constructor state (e.g. a trained
    * PQ codebook), which the FunctionRegistry string path can't express.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
