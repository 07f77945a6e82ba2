package graft

import org.apache.spark.sql.functions._
import graft.operators.EditSimilarity

class EditSimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(rows: Seq[(Long, String)], tau: Int) =
    (for {
      i <- rows.indices; j <- i + 1 until rows.length
      d = lev(rows(i)._2, rows(j)._2) if d <= tau
    } yield {
      val (a, b) = (rows(i), rows(j))
      if (a._1 < b._1) (a._1, b._1, d.toLong) else (b._1, a._1, d.toLong)
    }).toSet

  test("planted edit types: substitution, insertion, deletion, equal, short/empty strings") {
    val rows = Seq(
      1L -> "spark catalyst", 2L -> "spark catalist",   // substitution
      3L -> "tungsten", 4L -> "tungssten",              // insertion
      5L -> "shuffle", 6L -> "shufle",                  // deletion
      7L -> "broadcast", 8L -> "broadcast",             // equal (dist 0)
      9L -> "a", 10L -> "b", 11L -> "",                 // short + empty
      12L -> "completely different")
    val got = EditSimilarity
      .editDistanceSelfJoin(rows.toDF("id", "s"), "s", "id", tau = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute(rows, 1))
    assert(got.contains((1L, 2L, 1L)) && got.contains((3L, 4L, 1L)) &&
      got.contains((5L, 6L, 1L)) && got.contains((7L, 8L, 0L)))
    // len-1 and empty strings all pair within distance 1
    assert(got.contains((9L, 10L, 1L)) && got.contains((9L, 11L, 1L)))
  }

  private def bruteBetween(left: Seq[(Long, String)], right: Seq[(Long, String)], tau: Int) =
    (for {
      l <- left; r <- right
      d = lev(l._2, r._2) if d <= tau
    } yield (l._1, r._1, d.toLong)).toSet

  test("between-variant: directed cross-corpus pairs == brute force; no within-side pairs") {
    val left = Seq(1L -> "spark catalyst", 2L -> "tungsten", 3L -> "unique left")
    val right = Seq(10L -> "spark catalist", 11L -> "tungsten", 12L -> "unrelated string")
    val got = EditSimilarity
      .editDistancePairsBetween(left.toDF("id", "s"), right.toDF("id", "s"),
        "s", "id", tau = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === bruteBetween(left, right, 1))
    assert(got === Set((1L, 10L, 1L), (2L, 11L, 0L)))
    // within-side near-pairs must NOT appear (1-2 vs each other etc.)
    assert(got.forall { case (l, r, _) => l < 10 && r >= 10 })
  }

  test("between-variant tau=2 parity with brute force on real part names, planted typos") {
    val rel = Tables(spark, sf("sf0.001"), "part")
      .where(col("p_partkey") <= 150)
      .select(col("p_partkey"), col("p_name")).as[(Long, String)]
      .collect().toSeq
    val cand = rel.take(30).map { case (id, n) => (id + 100000L, "q" + n.drop(1)) } ++
      rel.slice(30, 40).map { case (id, n) => (id + 200000L, "qz" + n.drop(2)) } ++
      Seq((900000L, "nothing like a part name"))
    val got = EditSimilarity
      .editDistancePairsBetween(cand.toDF("id", "s"), rel.toDF("id", "s"),
        "s", "id", tau = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === bruteBetween(cand, rel, 2))
    assert(got.size >= 40, s"planted cross pairs missing: ${got.size}")
  }

  test("tau=2 full parity with brute force on real part names") {
    val rows = Tables(spark, sf("sf0.001"), "part")
      .where(col("p_partkey") <= 300)
      .select(col("p_partkey"), col("p_name")).as[(Long, String)]
      .collect().toSeq
    // plant near-misses: one substitution (dist 1) and one two-edit twin
    val planted = rows.take(20).flatMap { case (id, n) =>
      Seq((id + 100000L, "q" + n.drop(1)),
          (id + 200000L, "qz" + n.drop(2)))
    }
    val all = rows ++ planted
    val got = EditSimilarity
      .editDistanceSelfJoin(all.toDF("id", "s"), "s", "id", tau = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute(all, 2))
    assert(got.size >= 40, s"planted pairs missing: ${got.size}")
  }
}
