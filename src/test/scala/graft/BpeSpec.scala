package graft

import org.scalacheck.{Gen, rng}

import graft.operators.Bpe
import graft.operators.Bpe.Merge

class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, rng.Seed(seed)).get

  // hand-derived: "aaab"x3 + "ab"x2
  //   iter1 pairs: (a,a)=6, (a,b)=5        -> merge (a,a,6); aaab=[aa,a,b]
  //   iter2 pairs: (aa,a)=3, (a,b)=5       -> merge (a,b,5); aaab=[aa,ab], ab=[ab]
  //   iter3 pairs: (aa,ab)=3               -> merge (aa,ab,3); done
  private val handFreq = Seq(("aaab", 3L), ("ab", 2L))
  private val handMerges = Seq(
    Merge(0, "a", "a", 6L), Merge(1, "a", "b", 5L), Merge(2, "aa", "ab", 3L))

  test("local reference reproduces the hand-derived merge sequence, stops when fully merged") {
    assert(Bpe.learnMergesLocal(handFreq, numMerges = 10) === handMerges)
  }

  test("distributed learnMergesDistributed == hand derivation on the fixture") {
    val wf = handFreq.toDF("word", "freq")
    assert(Bpe.learnMergesDistributed(wf, numMerges = 10) === handMerges)
  }

  test("greedy leftmost non-overlap: 'aaa' merges to [aa, a], never overlapped") {
    val freq = Seq(("aaa", 1L))
    val want = Seq(Merge(0, "a", "a", 2L), Merge(1, "aa", "a", 1L))
    assert(Bpe.learnMergesLocal(freq, 5) === want)
    assert(Bpe.learnMergesDistributed(freq.toDF("word", "freq"), 5) === want)
  }

  test("distributed == local on random corpora, including supplementary-plane words") {
    for (round <- 0 until 3) {
      val wordGen = Gen.choose(1, 6).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
      val words = sample(Gen.listOfN(30, wordGen), 4100L + round)
      val freqs = sample(Gen.listOfN(30, Gen.choose(1L, 9L)), 4200L + round)
      // surrogate-pair symbols: a supplementary char must stay ONE symbol
      // on both routes (String.map-by-char would shear it locally)
      val wf = (words.zip(freqs) ++ Seq(("𝄞a𝄞a", 4L), ("é½é", 2L)))
        .groupBy(_._1).map { case (w, ps) => (w, ps.map(_._2).sum) }.toSeq
      val got = Bpe.learnMergesDistributed(wf.toDF("word", "freq"), numMerges = 10)
      val want = Bpe.learnMergesLocal(wf, numMerges = 10)
      assert(got === want, s"round=$round")
      assert(want.nonEmpty)
    }
  }

  test("hybrid routing: under-cap takes the local path, over-cap the distributed loop — identical tables") {
    val wf = (handFreq ++ Seq(("𝄞a𝄞a", 4L), ("cba", 2L))).toDF("word", "freq")
    // under the default cap: routed == local reference
    val routed = Bpe.learnMerges(wf, numMerges = 10)
    assert(routed === Bpe.learnMergesLocal(
      handFreq ++ Seq(("𝄞a𝄞a", 4L), ("cba", 2L)), numMerges = 10))
    // localDictCap = 1 forces the over-cap (distributed) route — the
    // merge table must be IDENTICAL (the routing must be invisible)
    assert(Bpe.learnMerges(wf, numMerges = 10, localDictCap = 1L) === routed)
    assert(routed.nonEmpty)
  }

  test("encodeWord applies merges lowest-rank-first; encode() round-trips the training dict") {
    val ranks = handMerges.map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("aaab", ranks) === Seq("aaab"))
    assert(Bpe.encodeWord("ab", ranks) === Seq("ab"))
    assert(Bpe.encodeWord("aab", ranks) === Seq("aa", "b"))
    assert(Bpe.encodeWord("ba", ranks) === Seq("b", "a"))
    assert(Bpe.encodeWord("", ranks) === Seq.empty)
    val docs = Seq((1L, "aaab ab aaab"), (2L, "aab")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, "text", "doc_id", handMerges)
      .as[(Long, Seq[String], Long)].collect()
      .map { case (id, t, n) => id -> ((t, n)) }.toMap
    assert(enc(1L) === ((Seq("aaab", "ab", "aaab"), 3L)))
    assert(enc(2L) === ((Seq("aa", "b"), 2L)))
  }

  test("empty corpus learns no merges; single-char words contribute no pairs") {
    assert(Bpe.learnMergesLocal(Seq.empty, 5) === Seq.empty)
    assert(Bpe.learnMerges(Seq.empty[(String, Long)].toDF("word", "freq"), 5) === Seq.empty)
    assert(Bpe.learnMergesDistributed(
      Seq.empty[(String, Long)].toDF("word", "freq"), 5) === Seq.empty)
    assert(Bpe.learnMergesLocal(Seq(("a", 9L), ("b", 3L)), 5) === Seq.empty)
  }

  test("encodeWord symbolizes by code point: learned supplementary merges apply at encode time") {
    // "𝄞a" merged during learning must match at encode: UTF-16-unit
    // symbolization would shear 𝄞 into surrogate halves that never
    // equal the merge table's code-point symbols
    val merges = Bpe.learnMergesLocal(Seq(("𝄞a𝄞a", 4L)), numMerges = 10)
    assert(merges.head === Merge(0, "𝄞", "a", 8L))
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    assert(Bpe.encodeWord("𝄞a𝄞a", ranks) === Seq("𝄞a𝄞a"))
    assert(Bpe.encodeWord("𝄞ab", ranks) === Seq("𝄞a", "b"))
    // unseen supplementary chars stay whole single symbols
    assert(Bpe.encodeWord("😀", Map.empty) === Seq("😀"))
  }

  test("encodeColumnar == encode on random corpora (learned tables), incl. supplementary plane") {
    // the q130 gate's subject: the per-word lowest-rank-first loop and
    // the rank-order columnar fold are structurally different
    // implementations that must segment identically under any LEARNED
    // merge table (rank k never re-creates a lower-rank pair)
    val rnd = new scala.util.Random(20260815L)
    val alphabets = Seq("ab", "abc", "a𝄞b")
    alphabets.foreach { alpha =>
      val docs = (1L to 20L).map { id =>
        val words = (0 until 1 + rnd.nextInt(4)).map { _ =>
          val cps = alpha.codePoints().toArray
          (0 until 1 + rnd.nextInt(6))
            .map(_ => new String(Character.toChars(cps(rnd.nextInt(cps.length)))))
            .mkString
        }
        (id, words.mkString(" "))
      }.toDF("doc_id", "text")
      val merges = Bpe.learnMerges(Bpe.wordFrequencies(docs, "text"), 6)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.concat_ws("\n",
              org.apache.spark.sql.functions.col("bpe_tokens")),
            org.apache.spark.sql.functions.col("n_bpe_tokens"))
          .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(canon(Bpe.encodeColumnar(docs, "text", "doc_id", merges)) ===
        canon(Bpe.encode(docs, "text", "doc_id", merges)),
        s"alphabet=$alpha merges=$merges")
    }
  }

  test("wordFrequencies: one corpus pass, null/blank docs excluded") {
    val docs = Seq((1L, "x y x"), (2L, "  "), (3L, null.asInstanceOf[String]), (4L, "y"))
      .toDF("doc_id", "text")
    val wf = Bpe.wordFrequencies(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(wf === Map("x" -> 2L, "y" -> 2L))
  }
}
