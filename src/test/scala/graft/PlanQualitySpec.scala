package graft

import org.apache.spark.sql.execution.QueryExecution

/** Plan-shape regressions: the properties that matter at 100 TB must stay
  * in the plan — column-pruned scans, broadcast dimension joins, partial
  * (map-side) aggregation, pushed filters.
  */
class PlanQualitySpec extends SparkSuite {

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("sf0.01"))
    val qe: QueryExecution = df.queryExecution
    qe.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("q01 scan is column-pruned to the 5 referenced columns") {
    val plan = formatted("q01_agg_pricing")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(Seq("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")
      .forall(readSchema.contains))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"))
  }

  test("q01 aggregation has a partial (map-side) phase") {
    assert(formatted("q01_agg_pricing").contains("partial_sum"))
  }

  test("q03 join chain broadcasts all dimension sides") {
    val plan = formatted("q03_join_chain")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3)
  }

  test("q08 pushes the not-null range-key filters into the scan") {
    val plan = formatted("q08_range_join")
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("IsNotNull(l_shipdate)"))
  }

  test("q26 plans through the custom AsOfJoinExec") {
    assert(formatted("q26_asof_join").contains("AsOfJoin"))
  }
}
