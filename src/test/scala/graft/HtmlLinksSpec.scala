package graft

import org.apache.spark.sql.functions._

import graft.functions.{HtmlLinksExpr, HtmlLinksKernel}

/** [[HtmlLinksKernel]] semantics + the Catalyst expression plumbing:
  * href attribute forms, anchor-text extraction through the html_text
  * contract, script/comment decoys, and malformed-HTML tolerance.
  */
class HtmlLinksSpec extends SparkSuite {
  import spark.implicits._

  private def links(html: String): Seq[(String, String)] =
    HtmlLinksKernel.extractLinks(html).toSeq

  test("href forms: double-quoted, single-quoted, unquoted, case-insensitive") {
    assert(links("""<a href="http://x/a">one</a>""") === Seq(("http://x/a", "one")))
    assert(links("<a href='http://x/b'>two</a>") === Seq(("http://x/b", "two")))
    assert(links("<a rel=nofollow href=http://x/c target=_blank>three</a>") ===
      Seq(("http://x/c", "three")))
    assert(links("<A HREF=\"http://x/d\">four</A>") === Seq(("http://x/d", "four")))
    // document order over multiple links
    assert(links("<a href=\"u1\">a</a> mid <a href='u2'>b</a>")
      === Seq(("u1", "a"), ("u2", "b")))
  }

  test("entities decode in href and anchor; anchor runs the html_text contract") {
    assert(links("""<a href="http://x/p?a=1&amp;b=2">A &amp; B</a>""") ===
      Seq(("http://x/p?a=1&b=2", "A & B")))
    // inline tags vanish; whitespace collapses; block boundaries flatten to spaces
    assert(links("<a href=\"u\">  Link <b>9</b>\n<p>next</p> </a>") ===
      Seq(("u", "Link 9 next")))
  }

  test("decoys yield nothing: no-href anchors, script/comment content, quoted '>'") {
    assert(links("<a name=\"x\">not a link</a>") === Seq.empty)
    assert(links("<script>var s = \"<a href='http://decoy/'>d</a>\";</script>") ===
      Seq.empty)
    assert(links("<!-- <a href=\"http://decoy/\">d</a> -->") === Seq.empty)
    assert(links("<style>a[href=\"http://decoy/\"] {}</style>") === Seq.empty)
    // a quoted '>' inside an attribute does not end the tag
    assert(links("""<a title="a>b" href="u">t</a>""") === Seq(("u", "t")))
  }

  test("self-closed anchors: empty anchor text, no document swallow, slash-stripped unquoted href") {
    // a self-closed <a/> has no inner content — the following text and
    // links must survive (regression: the kernel scanned for a
    // nonexistent </a> and consumed the rest of the document)
    assert(links("""<a href="x"/>after <a href="y">t</a>""") ===
      Seq(("x", ""), ("y", "t")))
    // unquoted value flush against '/>': the slash is the self-close,
    // not part of the URL
    assert(links("<a href=http://u/p/>tail") === Seq(("http://u/p", "")))
    // quoted trailing slash is preserved
    assert(links("""<a href="http://u/p/"/>""") === Seq(("http://u/p/", "")))
  }

  test("malformed HTML never throws: unclosed anchor, bare href, nested tag soup") {
    assert(links("<a href=\"u\">runs to end") === Seq(("u", "runs to end")))
    assert(links("<a href>empty</a>") === Seq(("", "empty")))
    assert(links("<a href=") === Seq(("", "")))
    assert(links("") === Seq.empty)
    assert(links("&&&& < a >") === Seq.empty)
  }

  test("expression: codegen plan, null-safe, struct field names") {
    val df = Seq(
      (1L, "<a href=\"http://x/1?a&amp;b\">one <i>x</i></a><a name=n>no</a>"),
      (2L, null.asInstanceOf[String]))
      .toDF("id", "html")
      .select(col("id"),
        posexplode_outer(HtmlLinksExpr.htmlLinks(col("html"))))
      .select(col("id"), col("pos"), col("col.href"), col("col.anchor"))
    val got = df.as[(Long, Option[Int], Option[String], Option[String])]
      .collect().sortBy(_._1)
    assert(got === Array(
      (1L, Some(0), Some("http://x/1?a&b"), Some("one x")),
      (2L, None, None, None)))
    val plan = spark.range(4)
      .select(HtmlLinksExpr.htmlLinks(
        concat(lit("<a href=u>t"), col("id").cast("string"), lit("</a>"))))
      .queryExecution.executedPlan.toString
    // the "*(1)" stage marker == inside WholeStageCodegen
    assert(plan.contains("*(1) Project"), plan)
  }
}
