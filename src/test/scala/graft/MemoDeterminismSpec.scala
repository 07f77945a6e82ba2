package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Pq}

/** `graft.core.Memo`'s whole contract is "a memoized model is IDENTICAL
  * to a retrained one because the trainers are deterministic" — the gated
  * serving queries (q59, q74) lean on it. This spec checks the claim
  * DIRECTLY: two cold trainings (no memo involved) must produce
  * bit-identical centroids, codebooks and rotation, so a future seed or
  * nondeterministic-sampling regression in Ivf/Pq training can't silently
  * decouple the memoized gate from what a cold run would compute.
  */
class MemoDeterminismSpec extends SparkSuite {

  private def sample = Tables(spark, sf("sf0.001"), "embeddings")
    .where(pmod(hash(col("vec_id")), lit(4)) === 0)

  test("Ivf.train twice cold: bit-identical centroids") {
    val a = Ivf.train(sample, "embedding", "vec_id", k = 8, iters = 2)
    val b = Ivf.train(sample, "embedding", "vec_id", k = 8, iters = 2)
    assert(a.centroids.length === b.centroids.length)
    a.centroids.zip(b.centroids).foreach { case (ca, cb) =>
      assert(java.util.Arrays.equals(ca, cb)) // exact, not approximate
    }
  }

  test("Pq.trainResidual twice cold: bit-identical codebooks and rotation") {
    val ivf = Ivf.train(sample, "embedding", "vec_id", k = 4, iters = 2)
    def train() = Pq.trainResidual(sample, "embedding", "vec_id", ivf,
      dim = 64, m = 8, k = 16, iters = 2, withRotation = true)
    val a = train(); val b = train()
    assert(a.m === b.m && a.dsub === b.dsub)
    a.codebooks.zip(b.codebooks).foreach { case (ma, mb) =>
      ma.zip(mb).foreach { case (ca, cb) =>
        assert(java.util.Arrays.equals(ca, cb))
      }
    }
    (a.rotation, b.rotation) match {
      case (Some(ra), Some(rb)) =>
        ra.zip(rb).foreach { case (rra, rrb) =>
          assert(java.util.Arrays.equals(rra, rrb))
        }
      case (None, None) => ()
      case _ => fail("rotation presence differs between cold trainings")
    }
  }

  test("Memo returns the first computation and clear() forces recompute") {
    graft.core.Memo.clear()
    var calls = 0
    def model() = graft.core.Memo.cached("memo_spec_key") { calls += 1; Vector(calls) }
    assert(model() === Vector(1) && model() === Vector(1) && calls === 1)
    graft.core.Memo.clear()
    assert(model() === Vector(2) && calls === 2)
  }
}
