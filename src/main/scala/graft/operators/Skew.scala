package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives. AQE's skew-join handles sort-merge skew at
  * runtime; these are the explicit tools for the cases AQE can't touch —
  * skewed AGGREGATION keys, and broadcast-ineligible dimension joins
  * against a hot key.
  */
object Skew {

  private def q(n: String): Column = col(s"`$n`")

  /** Two-phase (salted) aggregation: groupBy(keys + salt) partial, then
    * groupBy(keys) final. Breaks a hot grouping key across `saltBuckets`
    * reducers. Salt is derived deterministically from `saltCol` (any
    * high-cardinality column), keeping re-runs stable.
    *
    * Result is EXACTLY groupBy(keys).agg(count, sum) — verified by oracle.
    */
  def saltedCountSum(
      df: DataFrame,
      keys: Seq[String],
      sumCol: String,
      saltCol: String,
      saltBuckets: Int = 16
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(q(saltCol)), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(q) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(q(sumCol)).as("__s"))
    partial
      .groupBy(keys.map(q): _*)
      .agg(sum("__n").as("n"), sum("__s").as("sum_val"))
  }

  /** Salted join for a skewed fact side against a non-broadcastable
    * dimension: fact rows get a deterministic salt in [0, saltBuckets),
    * the dimension is replicated once per salt value, and the join key
    * becomes (key, salt) — splitting each hot key across `saltBuckets`
    * tasks. Row-preserving for inner and left joins.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltCol: String,
      joinType: String = "inner",
      saltBuckets: Int = 16
  ): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(q(saltCol)), lit(saltBuckets)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
