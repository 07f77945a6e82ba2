package graft

import org.scalacheck.{Gen, rng}

import graft.operators.{Dedup, EditSimilarity}

/** Randomized (seeded, reproducible) brute-force parity for the two
  * blocking-based pair machineries: the pigeonhole constructions promise
  * FULL recall at their bounds, so on any input the blocked result must
  * EQUAL the quadratic scan — not just on hand-picked fixtures.
  */
class PropertyParitySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, rng.Seed(seed)).get

  test("hammingPairs == brute force on random signatures, adversarial distance bounds") {
    // distances chosen to cross every chunk-width regime, including the
    // values the pre-round-10 ceil-width scheme broke (11, 16, 23, 45)
    val bounds = Seq(1, 5, 11, 16, 23, 31, 45)
    for ((maxDist, round) <- bounds.zipWithIndex) {
      val n = 48
      val base = sample(Gen.listOfN(n, Gen.long), 7000L + round)
      // plant mutated copies at exactly the bound: flip maxDist distinct
      // bit positions of the first few signatures
      val positions = sample(Gen.listOfN(maxDist.max(1), Gen.choose(0, 63)), 8100L + round)
        .distinct
      val planted = base.take(4).map(s => positions.foldLeft(s)((a, b) => a ^ (1L << b)))
      val sigs = (base ++ planted).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Dedup.hammingPairs(sigs.toDF("id", "sig"), maxDist)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
      val want = (for {
        i <- sigs.indices; j <- i + 1 until sigs.length
        d = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) if d <= maxDist
      } yield (sigs(i)._1, sigs(j)._1, d)).toSet
      assert(got === want, s"maxDist=$maxDist: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    }
  }

  test("editDistanceSelfJoin == brute force on random small-alphabet strings") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // tiny alphabet forces dense collisions: empty strings, equal strings,
    // and every edit type occur organically
    val strGen = Gen.choose(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for ((tau, round) <- Seq(1, 2, 3).zipWithIndex) {
      val strs = sample(Gen.listOfN(40, strGen), 9200L + round)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = EditSimilarity
        .editDistanceSelfJoin(strs.toDF("id", "s"), "s", "id", tau)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        i <- strs.indices; j <- i + 1 until strs.length
        d = lev(strs(i)._2, strs(j)._2) if d <= tau
      } yield (strs(i)._1, strs(j)._1, d.toLong)).toSet
      assert(got === want, s"tau=$tau: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, s"tau=$tau generated no qualifying pairs")
    }
  }
}
