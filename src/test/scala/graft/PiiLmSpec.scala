package graft

import org.apache.spark.sql.functions._
import graft.operators.{LmScore, Pii}

/** Direct behavior pins for the release-scrub + LM-score operators (their
  * end-to-end numbers are oracle-checked as q71/q72).
  */
class PiiLmSpec extends SparkSuite {
  import spark.implicits._

  test("PII redaction: emails, phones and IPs are replaced; prose survives") {
    val doc = "mail a.b+tag@foo-bar.org or call +44 20 7946 0958, host 192.168.0.1, " +
      "versions 1.2.3 and 10.4 stay, year 2024 stays"
    val out = Seq(doc).toDF("text").select(Pii.redact(col("text"))).head().getString(0)
    assert(out.contains("<EMAIL>") && !out.contains("@"))
    assert(out.contains("<PHONE>") && !out.contains("7946"))
    assert(out.contains("<IP>") && !out.contains("192.168.0.1"))
    // structure anchors hold: short dotted versions and years are NOT PII
    assert(out.contains("versions 1.2.3 and 10.4 stay"))
    assert(out.contains("year 2024 stays"))
  }

  test("PII match counts audit each rule independently") {
    val doc = "x@y.io and z@w.dev meet at 10.0.0.1"
    val row = Seq(doc).toDF("text").select(
      Pii.matchCount(col("text"), Pii.rules(0)._1).as("e"),
      Pii.matchCount(col("text"), Pii.rules(1)._1).as("i"),
      Pii.matchCount(col("text"), Pii.rules(2)._1).as("p")).head()
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) === ((2, 1, 0)))
  }

  test("duplicated-span coverage: planted shared paragraph is marked, unique text is not") {
    import graft.operators.TextStats
    // docs 1 and 2 share a 6-token boilerplate prefix; doc 3 is unique.
    val docs = Seq(
      (1L, "all rights reserved by the corp alpha beta gamma delta"),
      (2L, "all rights reserved by the corp epsilon zeta eta theta"),
      (3L, "completely original writing with no repeats anywhere at all then")
    ).toDF("doc_id", "text")
    val out = TextStats.dupSpanCoverage(docs, "text", "doc_id", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the shared prefix spans k-grams at pos 0 and 1 -> tokens 0..5 covered
    assert(out(1L) === ((6L, 10L)))
    assert(out(2L) === ((6L, 10L)))
    assert(out(3L) === ((0L, 10L)))
    // a doc repeating ITS OWN span is fully covered (k=5, repeated 5-gram)
    val self = Seq((9L, "one two three four five one two three four five"))
      .toDF("doc_id", "text")
    val r = TextStats.dupSpanCoverage(self, "text", "doc_id", k = 5)
      .collect().head
    assert(r.getLong(1) === 10L && r.getDouble(3) === 1.0)
  }

  test("removeDupSpans: covered spans are cut, unique text survives verbatim") {
    import graft.operators.TextStats
    // same planted fixture as the coverage test: the transform must remove
    // exactly the positions the score marks (score vs transform, one index)
    val docs = Seq(
      (1L, "all rights reserved by the corp alpha beta gamma delta"),
      (2L, "all rights reserved by the corp epsilon zeta eta theta"),
      (3L, "completely original writing with no repeats anywhere at all then")
    ).toDF("doc_id", "text")
    val out = TextStats.removeDupSpans(docs, "text", "doc_id", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) === ((4L, "alpha beta gamma delta")))
    assert(out(2L) === ((4L, "epsilon zeta eta theta")))
    assert(out(3L) === ((10L, "completely original writing with no repeats anywhere at all then")))
    // a self-repeating doc is fully covered -> scrubbed to empty text
    val self = Seq((9L, "one two three four five one two three four five"))
      .toDF("doc_id", "text")
    val r = TextStats.removeDupSpans(self, "text", "doc_id", k = 5).collect().head
    assert(r.getLong(1) === 0L && r.getString(2) === "")
  }

  test("removeDupSpans: long mostly-covered doc rebuilds in time linear in doc length") {
    import graft.operators.TextStats
    // Lee et al.'s motivating input: long documents where MOST positions
    // are covered. The round-6 rebuild probed membership per token
    // (O(tokens x covered) per doc); the gap-walk rebuild must cost the
    // same order as an equally long UNcovered doc. 50k distinct tokens per
    // doc, k=50: the covered pair shares every k-gram, the unique pair
    // shares none.
    val n = 50000
    def mk(p: String) = (0 until n).map(i => s"$p$i").mkString(" ")
    val covered = Seq((1L, mk("s")), (2L, mk("s"))).toDF("doc_id", "text")
    val unique  = Seq((3L, mk("u")), (4L, mk("v"))).toDF("doc_id", "text")
    def timed(df: org.apache.spark.sql.DataFrame): (Long, Map[Long, Long]) = {
      val t0 = System.nanoTime()
      val rows = TextStats.removeDupSpans(df, "text", "doc_id", k = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (System.nanoTime() - t0, rows)
    }
    val (tUniq, keptUniq) = timed(unique)   // warm first: JIT + codegen cache
    val (tCov, keptCov) = timed(covered)
    assert(keptCov === Map(1L -> 0L, 2L -> 0L))
    assert(keptUniq === Map(3L -> n.toLong, 4L -> n.toLong))
    // generous flake margin: the quadratic rebuild was ~2.5e9 probes/doc
    // here, orders beyond any ambient noise on a same-order assertion
    assert(tCov < 5 * tUniq + 3000000000L,
      s"covered ${tCov / 1e9}s vs unique ${tUniq / 1e9}s — rebuild not linear?")
    // partial coverage exercises the gap walk's head/tail range arithmetic
    // at scale: shared 25k-token prefix, distinct tails
    val half = n / 2
    def mkHalf(tail: String) =
      ((0 until half).map(i => s"s$i") ++ (0 until half).map(i => s"$tail$i")).mkString(" ")
    val partial = Seq((5L, mkHalf("p")), (6L, mkHalf("q"))).toDF("doc_id", "text")
    val rows = TextStats.removeDupSpans(partial, "text", "doc_id", k = 50)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows(5L)._1 === half.toLong)
    assert(rows(5L)._2 === (0 until half).map(i => s"p$i").mkString(" "))
    assert(rows(6L)._1 === half.toLong)
  }

  test("bigram LM score: word salad scores low where the unigram model is blind") {
    // All four "salad" tokens are COMMON unigrams (each appears in the
    // fluent corpus), but their transitions never occur — the
    // interpolated bigram score must separate salad from fluent text
    // while the unigram score alone cannot.
    val fluent = Seq.fill(40)("the cat sat on the mat")
    val salad  = Seq("mat the on cat")
    val corpus = (fluent ++ salad).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val uni = LmScore.unigramProbs(corpus, "text")
    val big = LmScore.bigramProbs(corpus, "text")
    val scores = LmScore.scoreDocsBigram(corpus, "text", "doc_id", big, uni,
        lambda = 0.75, pFloor = 1e-12, logFloor = -12.0)
      .select("id", "mean_logp").as[(Long, Double)].collect().toMap
    val uniScores = LmScore.scoreDocs(corpus, "text", "doc_id",
        LmScore.trainUnigram(corpus, "text"), oovLogp = -12.0)
      .select("id", "mean_logp").as[(Long, Double)].collect().toMap
    assert(scores(40L) < scores(0L) - 0.5)   // bigram: salad clearly lower
    // unigram: salad tokens are all common -> scores comparable (within 0.5)
    assert(math.abs(uniScores(40L) - uniScores(0L)) < 0.5)
    // docs with < 2 tokens take the floor with n_bigrams = 0
    val tiny = LmScore.scoreDocsBigram(
        Seq((1L, "word")).toDF("doc_id", "text"), "text", "doc_id", big, uni,
        lambda = 0.75, pFloor = 1e-12, logFloor = -12.0).collect().head
    assert(tiny.getDouble(1) === -12.0 && tiny.getLong(2) === 0L)
  }

  test("unigram LM score: common-token docs outscore rare/OOV-laden docs") {
    val corpus = (Seq.fill(50)("the cat sat on the mat") ++
      Seq("the dog sat", "zyx qwv jkl")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val uni = LmScore.trainUnigram(corpus, "text")
    val scores = LmScore.scoreDocs(corpus, "text", "doc_id", uni, oovLogp = -12.0)
      .select("id", "mean_logp").as[(Long, Double)].collect().toMap
    val common = scores(0L)      // pure high-frequency tokens
    val mixed  = scores(50L)     // mostly common + one rarer token
    val rare   = scores(51L)     // all near-singleton tokens
    assert(common > mixed && mixed > rare)
    // scoring docs with tokens the model never saw takes the OOV floor
    val oov = LmScore.scoreDocs(Seq((99L, "zz qq")).toDF("doc_id", "text"),
      "text", "doc_id", uni, oovLogp = -12.0)
      .select("mean_logp").head().getDouble(0)
    assert(oov === -12.0)
  }
}
