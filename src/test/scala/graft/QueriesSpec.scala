package graft

/** Guard: every driver-contract query plans and executes at sf0.001, and
  * the flagship entry returns rows. (Value-level correctness is the DuckDB
  * oracle's job — tools/check.py at sf0.01.)
  */
class QueriesSpec extends SparkSuite {

  test("entry() answers the flagship query") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys, names aligned") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf("sf0.001"))
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
