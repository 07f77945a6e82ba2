package graft

import org.apache.spark.sql.functions._
import graft.functions.{RobotsExpr, RobotsKernel}
import graft.operators.Domains

class RobotsSpec extends SparkSuite {
  import spark.implicits._

  private def rules(txt: String): Seq[(Boolean, String)] =
    RobotsKernel.parseRules(txt).toSeq

  test("parseRules: * group extracted; other agents, comments, unknown keys, pre-group rules ignored") {
    val txt =
      """|Disallow: /ignored-before-any-group
         |# a comment line
         |User-Agent: BadBot
         |Disallow: /
         |
         |user-agent: *   # trailing comment
         |Crawl-delay: 5
         |Disallow: /private
         |Allow: /private/ok
         |disallow:
         |Sitemap: https://example.com/sitemap.xml
         |""".stripMargin
    assert(rules(txt) === Seq((false, "/private"), (true, "/private/ok")))
  }

  test("parseRules: multi-agent group applies when ANY of its agents is *; groups for * merge") {
    val txt =
      """|User-agent: GoodBot
         |User-agent: *
         |Disallow: /a
         |
         |User-agent: OtherBot
         |Disallow: /other-only
         |
         |User-agent: *
         |Allow: /a/b
         |""".stripMargin
    assert(rules(txt) === Seq((false, "/a"), (true, "/a/b")))
  }

  test("parseRules: a user-agent line after a body line starts a NEW group") {
    val txt =
      """|User-agent: *
         |Disallow: /x
         |User-agent: OnlyBot
         |Disallow: /y
         |""".stripMargin
    assert(rules(txt) === Seq((false, "/x")))
  }

  test("parseRules: CRLF, mixed-case keys, colon-less junk lines tolerated") {
    val txt = "USER-AGENT: *\r\nDISALLOW: /q\r\nnot a directive\r\nAllow: /q/r\r\n"
    assert(rules(txt) === Seq((false, "/q"), (true, "/q/r")))
  }

  test("matches: prefixes, * wildcards, $ anchor, edge overlaps") {
    import RobotsKernel.matches
    assert(matches("/a/b/c", "/a"))
    assert(!matches("/x/a", "/a"))
    assert(matches("/a/b.pdf", "/a/*.pdf"))
    assert(matches("/a/x/y/b.pdf", "/a/*.pdf"))
    assert(!matches("/a/b.pdfx", "/a/*.pdf$"))
    assert(matches("/a/b.pdf", "/a/*.pdf$"))
    assert(matches("/A/7", "/A/*7$"))       // star consumes zero chars
    assert(matches("/A/100", "*0$"))        // anchored last part flush at end
    assert(!matches("/A/101", "*0$"))
    assert(matches("abb", "a*b*b$"))        // middle/last no overlap
    assert(!matches("ab", "a*b*b$"))
    assert(matches("/dir/", "/dir/$"))      // literal anchored = exact
    assert(!matches("/dir/x", "/dir/$"))
    assert(matches("/any/thing", "/any*"))  // trailing star
    assert(matches("/a**b", "/a**b"))       // consecutive stars = one
  }

  test("matches agrees with a regex-translation reference on randomized patterns/paths") {
    // reference: quote literal segments, '*' -> '.*', trailing '$' kept;
    // regex backtracking is the ground truth for the greedy-earliest
    // kernel's completeness claim
    def refMatches(path: String, pattern: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val pat = if (anchored) pattern.dropRight(1) else pattern
      val rx = "^" + pat.split("\\*", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*") + (if (anchored) "$" else "")
      rx.r.findFirstIn(path).isDefined
    }
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "ab/."
    def randStr(max: Int) =
      (0 until rnd.nextInt(max + 1)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    var checked = 0
    for (_ <- 0 until 4000) {
      val nSeg = 1 + rnd.nextInt(3)
      val pattern = "/" + (0 until nSeg).map(_ => randStr(3)).mkString("*") +
        (if (rnd.nextBoolean()) "$" else "")
      val path = "/" + randStr(8)
      assert(RobotsKernel.matches(path, pattern) === refMatches(path, pattern),
        s"path='$path' pattern='$pattern'")
      checked += 1
    }
    assert(checked === 4000)
  }

  test("allowed: longest match wins, tie goes to allow, no match allows") {
    import org.apache.spark.sql.Row
    val df = Seq(
      ("/private/ok/file", true),   // allow /private/ok (len 11) beats /private (8)
      ("/private/other", false),
      ("/elsewhere", true),         // no match
      ("/tie", true)                // tie: allow /tie + disallow /tie → allow
    ).toDF("path", "want")
    val txt = "User-agent: *\nDisallow: /private\nAllow: /private/ok\n" +
      "Disallow: /tie\nAllow: /tie\n"
    val got = df.select(col("path"), col("want"),
        RobotsExpr.robotsAllowed(
          RobotsExpr.robotsRules(lit(txt)), col("path")).as("got"))
      .collect()
    got.foreach { case Row(p: String, want: Boolean, g: Boolean) =>
      assert(g === want, s"path $p")
    }
  }

  test("applyRobots: per-host rules enforced; missing-robots hosts and null hosts pass") {
    val docs = Seq(
      (1L, Some("a.com"), "/blocked/page"),
      (2L, Some("a.com"), "/open/page"),
      (3L, Some("b.com"), "/blocked/page"),  // b.com has no robots row
      (4L, None, "/blocked/page")            // no host
    ).toDF("doc_id", "host", "path")
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /blocked\n"))
      .toDF("host", "robots_txt")
    def run(bcast: Boolean) = Domains.applyRobots(
        docs, "host", "path", robots, broadcastRobots = bcast)
      .select("doc_id").as[Long].collect().toSet
    val b = run(bcast = true)
    assert(b === Set(2L, 3L, 4L))
    assert(run(bcast = false) === b)
  }

  test("applyRobots: a re-fetched (duplicate) robots row never fans out docs") {
    val docs = Seq(
      (1L, "a.com", "/blocked/page"),
      (2L, "a.com", "/open/page")
    ).toDF("doc_id", "host", "path")
    // two rows for a.com (a re-fetch) — the lexicographically-least body
    // wins deterministically, and no doc row duplicates
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /blocked\n"),
      ("a.com", "User-agent: *\nDisallow: /open\n")
    ).toDF("host", "robots_txt")
    val got = Domains.applyRobots(docs, "host", "path", robots)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got === Seq(2L)) // "Disallow: /blocked" < "Disallow: /open"
  }

  test("applyRobots parses robots once per host and probes map-side (broadcast, no corpus shuffle)") {
    val docs = Seq((1L, "a.com", "/p")).toDF("doc_id", "host", "path")
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /q\n"))
      .toDF("host", "robots_txt")
    val plan = Domains.applyRobots(docs, "host", "path", robots)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("robots_allowed"), plan)
  }

  test("webClean robots stage: compliance before URL dedup — a disallowed variant neither wins nor shields its canonical group") {
    import graft.corpus.CrawlPipeline
    val docs = Seq(
      // canonical twins (trailing slash collapses): the LOWER id is the
      // disallowed slash variant — robots-after-dedup would keep id 1
      // (blocked content!) and emit nothing for the group
      (1L, "http://a.com/dir/", "a.com"),
      (2L, "http://a.com/dir", "a.com"),
      (3L, "http://a.com/open", "a.com"))
      .toDF("doc_id", "url", "host")
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /dir/$\n"))
      .toDF("host", "robots_txt")
    val kept = CrawlPipeline.webClean(docs,
        CrawlPipeline.WebConfig(robots = Some(robots)))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
    // without robots, canonical dedup keeps the lowest id of the group
    assert(CrawlPipeline.webClean(docs, CrawlPipeline.WebConfig())
      .select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
  }

  test("applyRobots runs unchanged on a stream (stream-static broadcast join, stateless)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /blocked\n"))
      .toDF("host", "robots_txt")
    val in = MemoryStream[(Long, String, String)]
    val out = Domains.applyRobots(
      in.toDF().toDF("doc_id", "host", "path"), "host", "path", robots)
    val q = out.writeStream.format("memory").queryName("robots_stream")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "a.com", "/blocked/page"),
        (2L, "a.com", "/open/page"),
        (3L, "norobots.com", "/blocked/page"))
      q.processAllAvailable()
      assert(spark.table("robots_stream").select("doc_id").as[Long]
        .collect().toSet === Set(2L, 3L))
    } finally q.stop()
  }

  test("robots expressions participate in whole-stage codegen") {
    // range keeps the input non-foldable so the expressions actually
    // run inside generated code rather than constant-folding away
    val df = spark.range(2)
      .select(concat(lit("User-agent: *\nDisallow: /"),
          col("id").cast("string"), lit("\n")).as("txt"),
        concat(lit("/"), col("id").cast("string"), lit("/y")).as("path"))
      .select(col("path"), RobotsExpr.robotsAllowed(
        RobotsExpr.robotsRules(col("txt")), col("path")).as("ok"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(1)" stage marker == inside WholeStageCodegen
    assert(plan.contains("*(1) Project"), plan)
    assert(df.orderBy("path").as[(String, Boolean)].collect().toSeq ===
      Seq(("/0/y", false), ("/1/y", false)))
  }
}
