package graft

import org.apache.spark.sql.functions._
import graft.operators.Paragraphs

/** Paragraph-granular near-dup: the splitters' contracts and the
  * doc-verdict aggregation (q77 oracle-checks the token-window + exact
  * route end-to-end; this pins the blank-line rule — which the synthetic
  * single-line corpus can't exercise — and LSH/exact agreement on
  * planted duplicates).
  */
class ParagraphsSpec extends SparkSuite {
  import spark.implicits._

  private val boiler = "the quick brown fox jumps over the lazy dog again today"

  test("blank-line split: indices ordered, blank runs dropped") {
    val df = Seq(
      (1L, s"alpha beta gamma\n\n$boiler\n \n\ndelta epsilon zeta eta")
    ).toDF("doc_id", "text")
    val paras = Paragraphs.splitBlankLines(df, "text", "doc_id")
      .orderBy("para_idx").select("para_idx", "para")
      .as[(Int, String)].collect()
    assert(paras.map(_._2.trim) ===
      Seq("alpha beta gamma", boiler, "delta epsilon zeta eta"))
    // indices keep positional order even when blanks are dropped between
    assert(paras.map(_._1) === paras.map(_._1).sorted)
  }

  test("cross-doc copied paragraph found by both routes; intra-doc excluded") {
    // doc 1 and doc 2 share ONE boilerplate paragraph verbatim; doc 3 is
    // unrelated; doc 1 repeats the boilerplate internally (must NOT count).
    val df = Seq(
      (1L, s"one two three four five six\n\n$boiler\n\n$boiler"),
      (2L, s"seven eight nine ten eleven twelve\n\n$boiler"),
      (3L, "totally different words everywhere nothing shared at all here now")
    ).toDF("doc_id", "text")
    val paras = Paragraphs.splitBlankLines(df, "text", "doc_id")
    def verdicts(viaLsh: Boolean) =
      Paragraphs.nearDupDocPairs(paras, shingleN = 3, threshold = 0.9, viaLsh = viaLsh)
        .select("doc_a", "doc_b", "n_para_pairs")
        .as[(Long, Long, Long)].collect().toSet
    val exact = verdicts(viaLsh = false)
    // doc1 holds TWO copies, doc2 one -> two cross-doc paragraph pairs
    assert(exact === Set((1L, 2L, 2L)))
    // identical paragraphs collide in every LSH band: full recall here
    assert(verdicts(viaLsh = true) === exact)
  }

  test("token windows tile the token stream in order") {
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val paras = Paragraphs.splitTokenWindows(
        Seq((7L, text)).toDF("doc_id", "text"), "text", "doc_id", window = 16)
      .orderBy("para_idx").select("para").as[String].collect()
    assert(paras.length === 3)                       // 16 + 16 + 8
    assert(paras.mkString(" ") === text)             // lossless, ordered
    assert(paras(2).split(" ").length === 8)         // tail window kept
  }

  test("packed paragraph key overflow raises instead of aliasing") {
    val paras = Seq((1L, 5, "a b c d"), (2L, 0, "a b c d"))
      .toDF("id", "para_idx", "para")
    val ex = intercept[Exception] {
      Paragraphs.nearDupDocPairs(paras, shingleN = 3, threshold = 0.5,
        viaLsh = false, idxCap = 4L).collect()
    }
    assert(ex.getMessage.contains("overflows"))
  }

  test("packed DOC-ID overflow and negative ids raise instead of aliasing") {
    // id * idxCap wraps Long for id >= Long.MaxValue / idxCap — the guard
    // must be symmetric with the paragraph-index arm (round-6 advice).
    val big = Long.MaxValue / 1000000L  // smallest aliasing id at default cap
    val over = Seq((big, 0, "a b c d"), (1L, 0, "a b c d"))
      .toDF("id", "para_idx", "para")
    val ex = intercept[Exception] {
      Paragraphs.nearDupDocPairs(over, shingleN = 3, threshold = 0.5,
        viaLsh = false).collect()
    }
    assert(ex.getMessage.contains("doc id overflows"))
    val neg = Seq((-1L, 0, "a b c d"), (1L, 0, "a b c d"))
      .toDF("id", "para_idx", "para")
    val ex2 = intercept[Exception] {
      Paragraphs.nearDupDocPairs(neg, shingleN = 3, threshold = 0.5,
        viaLsh = false).collect()
    }
    assert(ex2.getMessage.contains("doc id overflows"))
    // the largest safe id still packs fine
    val ok = Seq((big - 1, 0, "a b c d"), (big - 1, 1, "x y z w"))
      .toDF("id", "para_idx", "para")
    assert(Paragraphs.nearDupDocPairs(ok, shingleN = 3, threshold = 0.5,
      viaLsh = false).count() === 0)
  }

  test("auto-route finds borderline-SHORT and LONG duplicates in one call") {
    // Short pair: 4 tokens, shingleN=3 -> 2 shingles, far below the LSH
    // floor (banding recall probabilistic there — the q77 finding).
    // Long pair: 30 tokens -> 28 shingles, well above the floor.
    val longText = (1 to 30).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha beta gamma delta\n\n$longText"),
      (2L, "alpha beta gamma delta\n\nsomething else entirely different here okay"),
      (3L, s"unrelated opening paragraph words only\n\n$longText"),
      (4L, "no shared content at all anywhere in this document today friends")
    ).toDF("doc_id", "text")
    val paras = Paragraphs.splitBlankLines(df, "text", "doc_id")
    val auto = Paragraphs.nearDupDocPairsAuto(paras, shingleN = 3,
        threshold = 0.9, lshMinShingles = 8)
      .select("doc_a", "doc_b", "n_para_pairs")
      .as[(Long, Long, Long)].collect().toSet
    // the short copy (1,2) comes from the exact route, the long copy (1,3)
    // from LSH — identical paragraphs collide in every band
    assert(auto === Set((1L, 2L, 1L), (1L, 3L, 1L)))
    // agreement with the exact route over the whole corpus: the routed
    // union must lose no qualifying pair and double-count none
    val exact = Paragraphs.nearDupDocPairs(paras, shingleN = 3,
        threshold = 0.9, viaLsh = false)
      .select("doc_a", "doc_b", "n_para_pairs")
      .as[(Long, Long, Long)].collect().toSet
    assert(auto === exact)
  }

  test("auto-route routes on DISTINCT shingles: repetitive boilerplate pairs with short dups") {
    // Paragraph 2 has 40 tokens but ONE distinct shingle ("spam spam
    // spam") — routing on the token-derived count would push it to the
    // LSH side while its 3-token duplicate (1 shingle, under the LSH
    // floor) stays exact-only, and the J=1.0 pair would be missed by
    // both routes. Paragraph 3 is long AND diverse so the corpus
    // actually takes the two-route path (anyLong = true).
    val paras = Seq(
      (1L, 0, "spam spam spam"),
      (2L, 0, ("spam " * 40).trim),
      (3L, 0, (1 to 30).map(i => s"w$i").mkString(" "))
    ).toDF("id", "para_idx", "para")
    val pairs = Paragraphs.nearDupDocPairsAuto(paras, shingleN = 3,
        threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("auto-route static bound: window-split corpus goes exact-only, same pairs") {
    // Token-window paragraphs are bounded at window - n + 1 shingles by
    // construction; passing that bound lets the router skip both the
    // existence probe and the redundant LSH pass. Results must equal the
    // probed route AND the plain exact route.
    val df = Seq(
      (1L, ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim),
      (2L, ("alpha beta gamma delta epsilon zeta eta theta " * 4).trim + " coda"),
      (3L, "totally different words in this one nothing shared with others at all")
    ).toDF("doc_id", "text")
    val paras = Paragraphs.splitTokenWindows(df, "text", "doc_id", window = 16)
    def pairs(p: org.apache.spark.sql.DataFrame) =
      p.select("doc_a", "doc_b", "n_para_pairs").as[(Long, Long, Long)].collect().toSet
    val static = pairs(Paragraphs.nearDupDocPairsAuto(paras, 3, 0.5,
      knownMaxShingles = Some(16 - 3 + 1)))
    val probed = pairs(Paragraphs.nearDupDocPairsAuto(paras, 3, 0.5))
    val exact = pairs(Paragraphs.nearDupDocPairs(paras, 3, 0.5, viaLsh = false))
    assert(static.nonEmpty && static === probed && static === exact)
  }
}
