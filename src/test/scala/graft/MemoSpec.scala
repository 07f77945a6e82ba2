package graft

import org.scalatest.funsuite.AnyFunSuite

/** The offline-model memo must be compute-once-per-key (that is the whole
  * point) and resettable — and because every trainer behind it is
  * deterministic, a cleared-and-recomputed value must equal the memoized
  * one (the property that makes memoization correctness-neutral; the
  * trainer determinism itself is pinned in IvfSpec/PqSpec).
  */
class MemoSpec extends AnyFunSuite {
  test("cached computes once per key; clear() resets; keys are independent") {
    graft.core.Memo.clear()
    var n = 0
    def get(k: String) = graft.core.Memo.cached(s"memospec:$k") { n += 1; s"v$n" }
    assert(get("a") === "v1")
    assert(get("a") === "v1")     // memo hit, no recompute
    assert(get("b") === "v2")     // different key computes
    assert(n === 2)
    graft.core.Memo.clear()
    assert(get("a") === "v3")     // recomputed after clear
  }
}
