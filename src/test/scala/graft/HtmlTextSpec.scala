package graft

import org.apache.spark.sql.functions._

import graft.functions.{HtmlTextExpr, HtmlTextKernel}

/** [[HtmlTextKernel]] semantics + the Catalyst expression plumbing:
  * block segmentation, script/style/comment removal, entity decode,
  * whitespace normalization, and the malformed-HTML tolerance a crawl
  * requires (nothing throws, content survives).
  */
class HtmlTextSpec extends SparkSuite {
  import spark.implicits._

  private def x(html: String): String = HtmlTextKernel.extractText(html)

  test("block tags break lines; inline tags vanish without breaking words") {
    assert(x("<p>Hello world</p><p>Second para</p>") === "Hello world\nSecond para")
    assert(x("super<b>cali</b>fragilistic") === "supercalifragilistic")
    assert(x("<h1>Title</h1><div>body <span>text</span></div>") === "Title\nbody text")
    assert(x("line one<br>line two<br/>line three") === "line one\nline two\nline three")
    assert(x("<ul><li>a</li><li>b</li></ul>") === "a\nb")
  }

  test("script and style drop WITH their content; comments and doctype drop") {
    assert(x("<!DOCTYPE html><html><head><title>T</title>" +
      "<script>var x = '<p>not text</p>';</script>" +
      "<style>p { color: red }</style></head>" +
      "<body><p>real</p><!-- hidden --></body></html>") === "T\nreal")
    // case-insensitive close tag, attributes on the open tag
    assert(x("<SCRIPT type=\"text/javascript\">alert(1)</ScRiPt>after") === "after")
  }

  test("entities decode: named, decimal, hex, supplementary plane") {
    assert(x("a &amp; b &lt;tag&gt; &quot;q&quot; &apos;s&apos;") ===
      "a & b <tag> \"q\" 's'")
    assert(x("&#72;&#105;") === "Hi")
    assert(x("&#x48;&#x69;") === "Hi")
    assert(x("emoji &#x1F600; here") === "emoji 😀 here")
    // nbsp and numeric whitespace are TEXT whitespace, not block breaks
    assert(x("a&nbsp;b") === "a b")
    assert(x("a&#10;b") === "a b")
    // unrecognized entities and bare ampersands stay literal
    assert(x("AT&T &bogus; &#; &") === "AT&T &bogus; &#; &")
    // decoded markup characters are TEXT, never re-parsed as tags
    assert(x("&lt;script&gt;not code&lt;/script&gt;") === "<script>not code</script>")
  }

  test("whitespace normalizes: runs collapse, newline beats space, ends trim") {
    assert(x("<p>  a   b  </p>\n\n<p>c</p>") === "a b\nc")
    assert(x("<p>multi\nline\ncontent</p>") === "multi line content")
    assert(x("<p></p><p></p><p>only</p><p></p>") === "only")
    assert(x("") === "" && x("   \n  ") === "")
  }

  test("malformed HTML never throws: stray <, attribute >, unclosed constructs") {
    assert(x("for a < b and c > d") === "for a < b and c > d")
    assert(x("""<a title="a>b" href="#">link</a>""") === "link")
    assert(x("<p>unclosed comment <!-- never ends") === "unclosed comment")
    assert(x("<p>unclosed script <script>var x = 1;") === "unclosed script")
    assert(x("""<p>unclosed quote <a title="oops>gone""") === "unclosed quote")
    assert(x("trailing open tag <") === "trailing open tag <")
    // a self-closed <script/> has no content to skip — text continues
    assert(x("<p>self-closed script <script src=\"x\"/> keeps going") ===
      "self-closed script keeps going")
  }

  test("the Catalyst expression runs inside the plan (codegen path) and matches the kernel") {
    val html = "<html><head><script>junk()</script></head>" +
      "<body><h1>Header &amp; more</h1><p>body   text</p></body></html>"
    val got = Seq((1L, html), (2L, null.asInstanceOf[String]))
      .toDF("id", "html")
      .select(col("id"), HtmlTextExpr.htmlText(col("html")).as("t"))
      .as[(Long, Option[String])].collect().sortBy(_._1)
    assert(got(0)._2 === Some(HtmlTextKernel.extractText(html)))
    assert(got(0)._2 === Some("Header & more\nbody text"))
    assert(got(1)._2 === None) // null-safe
  }

  test("ampersand-heavy text stays linear; surrogate entities stay literal") {
    // 200k bare ampersands with no semicolon anywhere: the bounded
    // entity window must keep this linear (an unbounded indexOf(';')
    // made it quadratic — minutes instead of milliseconds)
    val heavy = "&" * 200000
    val t0 = System.nanoTime()
    assert(HtmlTextKernel.extractText(heavy) === heavy)
    assert((System.nanoTime() - t0) / 1e9 < 5.0)
    // an entity whose ';' lies beyond the 12-char window is literal text
    assert(HtmlTextKernel.extractText("&aaaaaaaaaaaaaaaa;") === "&aaaaaaaaaaaaaaaa;")
    // numeric entities in the surrogate range would decode to a LONE
    // surrogate (invalid UTF-16) — they stay literal like any
    // unrecognized entity; a real supplementary entity still decodes
    assert(HtmlTextKernel.extractText("a&#xD800;b") === "a&#xD800;b")
    assert(HtmlTextKernel.extractText("a&#x1F600;b") === "a\ud83d\ude00b")
  }
}
