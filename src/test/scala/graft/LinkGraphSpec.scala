package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkGraph

/** [[LinkGraph.pageRank]]: hand-checked small graph, mass conservation
  * with dangling nodes, isolated-node universe handling, and randomized
  * parity against the single-process reference.
  */
class LinkGraphSpec extends SparkSuite {
  import spark.implicits._

  private def distributed(edges: Seq[(Long, Long)], nodes: Seq[Long],
                          iters: Int, damping: Double = 0.85): Map[Long, Double] =
    LinkGraph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters, damping,
        nodes = Some(nodes.toDF("node")))
      .as[(Long, Double)].collect().toMap

  test("hand-checked 4-node graph with a dangling node") {
    // 0->1, 0->2, 1->2, 2->0; 3 dangling
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L))
    val nodes = Seq(0L, 1L, 2L, 3L)
    val got = distributed(edges, nodes, iters = 2)
    val want = LinkGraph.pageRankLocal(edges, nodes, 2, 0.85)
    nodes.foreach { v => assert(math.abs(got(v) - want(v)) < 1e-12, s"node $v") }
    // after one iteration from uniform: node 3 receives only teleport +
    // its share of dangling mass (its own 1/4)
    val one = distributed(edges, nodes, iters = 1)
    val exp3 = 0.15 / 4 + 0.85 * (0.25 / 4)
    assert(math.abs(one(3L) - exp3) < 1e-12)
  }

  test("rank mass is conserved: sums to 1 every iteration, dangling included") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)) // 3 dangling
    val nodes = Seq(0L, 1L, 2L, 3L, 4L) // 4 isolated AND dangling
    for (it <- Seq(1, 3, 5)) {
      val got = distributed(edges, nodes, it)
      assert(got.size === 5)
      assert(math.abs(got.values.sum - 1.0) < 1e-9, s"iters=$it")
    }
  }

  test("no-edges graph: every node keeps the uniform rank") {
    val nodes = Seq(0L, 1L, 2L)
    val got = distributed(Seq.empty, nodes, iters = 3)
    nodes.foreach(v => assert(math.abs(got(v) - 1.0 / 3) < 1e-12))
  }

  test("default node universe is distinct(src ∪ dst); duplicate edges weight double") {
    val got = LinkGraph.pageRank(
        Seq((0L, 1L), (0L, 1L), (0L, 2L), (1L, 0L)).toDF("src", "dst"),
        "src", "dst", iterations = 1)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(0L, 1L, 2L))
    // node 1 gets 2/3 of node 0's rank, node 2 gets 1/3
    val want = LinkGraph.pageRankLocal(
      Seq((0L, 1L), (0L, 1L), (0L, 2L), (1L, 0L)), Seq(0L, 1L, 2L), 1, 0.85)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, s"node $v") }
    assert(got(1L) > got(2L))
  }

  test("explicit universe excluding edge endpoints: out-of-universe edges drop, mass conserved") {
    // edges touching node 9 (outside the universe) must not inject rank
    // from nowhere (9 as src) nor leak mass into the void (9 as dst)
    val edges = Seq((0L, 1L), (9L, 1L), (1L, 9L), (1L, 2L), (2L, 0L))
    val nodes = Seq(0L, 1L, 2L)
    for (it <- Seq(1, 3)) {
      val got = distributed(edges, nodes, it)
      assert(got.keySet === Set(0L, 1L, 2L))
      assert(math.abs(got.values.sum - 1.0) < 1e-9, s"iters=$it")
      val want = LinkGraph.pageRankLocal(edges, nodes, it, 0.85)
      nodes.foreach(v => assert(math.abs(got(v) - want(v)) < 1e-12, s"node $v"))
    }
  }

  test("pageRankConverged: early stop on a stable graph, cap respected, parity at the stop point") {
    // no edges: one update keeps the uniform distribution, so the first
    // window check (i=4) sees delta 0 and stops far below the cap
    val nodes = Seq(0L, 1L, 2L)
    val (r0, it0) = LinkGraph.pageRankConverged(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst",
      tol = 1e-12, maxIterations = 100, nodes = Some(nodes.toDF("node")))
    assert(it0 === 4)
    r0.as[(Long, Double)].collect().foreach { case (_, r) =>
      assert(math.abs(r - 1.0 / 3) < 1e-12)
    }
    // a real graph: the returned ranks equal the fixed-iteration run at
    // the reported stop point, mass conserved
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L))
    val (r1, it1) = LinkGraph.pageRankConverged(
      edges.toDF("src", "dst"), "src", "dst",
      tol = 1e-7, maxIterations = 60, nodes = Some(nodes.toDF("node")))
    assert(it1 < 60, s"should converge before the cap, ran $it1")
    val got = r1.as[(Long, Double)].collect().toMap
    val want = LinkGraph.pageRankLocal(edges, nodes, it1, 0.85)
    nodes.foreach(v => assert(math.abs(got(v) - want(v)) < 1e-9, s"node $v"))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // cap binds when tol is unreachable
    val (_, it2) = LinkGraph.pageRankConverged(
      edges.toDF("src", "dst"), "src", "dst",
      tol = 0.0, maxIterations = 3, nodes = Some(nodes.toDF("node")))
    assert(it2 === 3)
  }

  test("randomized parity with the single-process reference (incl. 8-iter checkpoint path)") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 6) {
      val n = 2 + rnd.nextInt(23)
      val m = rnd.nextInt(61)
      val es = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val iters = Seq(1, 3, 8)(trial % 3) // 8 exercises the checkpoint path
      val nodes = (0L until n.toLong).toSeq
      val got = distributed(es, nodes, iters)
      val want = LinkGraph.pageRankLocal(es, nodes, iters, 0.85)
      nodes.foreach { v =>
        assert(math.abs(got(v) - want(v)) < 1e-9,
          s"trial=$trial node=$v iters=$iters")
      }
    }
  }
}
