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
}
