package graft

import org.apache.spark.sql.functions._

import graft.functions.UrlFns
import graft.operators.Domains

class UrlDomainsSpec extends SparkSuite {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlFns.canonicalUrl(col("url"))).as[String].collect().toSeq

  test("canonicalUrl: every branch — case, www, default ports, slash, tracking, fragment") {
    val got = canon(
      "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&a=1&fbclid=z#frag",
      "http://Site.org:8080/a/b/",
      "http://a.com",
      "http://a.com/?utm_medium=x",
      "http://a.com:80/p?b=2&a=1",
      "http://a.com:443/p"
    )
    assert(got === Seq(
      // scheme+host folded, www and :443 stripped, PATH case kept,
      // trailing slash gone, tracked params out, survivor kept, no '#'
      "https://example.com/Path?a=1",
      // non-default port survives
      "http://site.org:8080/a/b",
      "http://a.com",
      // query fully stripped -> no '?', root slash stripped
      "http://a.com",
      // :80 is http's default; surviving param ORDER preserved (b before a)
      "http://a.com/p?b=2&a=1",
      // :443 is NOT http's default -> kept
      "http://a.com:443/p"
    ))
  }

  test("canonicalUrl: params NAMED like tracked ones mid-name are not clipped") {
    assert(canon("https://a.com/p?xutm_source=1&prefetch=2&ref=drop&href=keep") ===
      Seq("https://a.com/p?xutm_source=1&prefetch=2&href=keep"))
  }

  test("urlHost: lowercased, www/default-port stripped, scheme-aware") {
    val got = Seq(
      "HTTP://WWW.A.com:80/x", "https://B.org:443", "https://c.net:80/y")
      .toDF("url").select(UrlFns.urlHost(col("url"))).as[String].collect().toSeq
    // :80 under httpS is NOT the default -> kept
    assert(got === Seq("a.com", "b.org", "c.net:80"))
  }

  test("perDomainCap: lowest-id-first, deterministic; small groups pass whole") {
    val docs = Seq(
      (5L, "a.com"), (1L, "a.com"), (3L, "a.com"), (9L, "a.com"),
      (2L, "b.com"), (7L, "b.com")
    ).toDF("doc_id", "host")
    val kept = Domains.perDomainCap(docs, "host", "doc_id", cap = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 2L, 7L))
    val all = Domains.perDomainCap(docs, "host", "doc_id", cap = 10).count()
    assert(all === 6)
  }

  test("URL canonicalization + domain mixing run unchanged in Structured Streaming (stateless)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = in.toDF().toDF("doc_id", "url")
      .withColumn("host", UrlFns.urlHost(col("url")))
      .withColumn("curl", UrlFns.canonicalUrl(col("url")))
      .where(graft.operators.Sampling.byHashPredicate(col("doc_id"), 1.0))
    val q = out.writeStream.format("memory").queryName("url_stream")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "HTTPS://WWW.A.com:443/P/?utm_source=x&k=1#f"),
        (2L, "http://b.org:8080/q"))
      q.processAllAvailable()
      val rows = spark.table("url_stream")
        .select("doc_id", "host", "curl").as[(Long, String, String)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(rows(1L) === (("a.com", "https://a.com/P?k=1")))
      assert(rows(2L) === (("b.org:8080", "http://b.org:8080/q")))
    } finally q.stop()
  }

  test("domainStratifiedSample: fraction 1.0 keeps a host whole, default 0.0 drops the rest") {
    val docs = (1L to 40L).map(i => (i, if (i % 2 == 0) "keep.com" else "drop.com"))
      .toDF("doc_id", "host")
    val kept = Domains.domainStratifiedSample(docs, "host", "doc_id",
        Map("keep.com" -> 1.0), defaultFraction = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === (1L to 40L).filter(_ % 2 == 0).toSet)
  }

  test("dedupByCanonicalUrl: scheme-case/www/port/tracking variants collapse to lowest id; null-host urls pass through") {
    val docs = Seq(
      (1L, "HTTPS://WWW.A.com:443/P?utm_source=x&k=1"),
      (5L, "https://a.com/P?k=1&utm_campaign=y"),       // same canonical as 1
      (3L, "https://a.com/P?k=1#frag"),                 // same canonical as 1
      (2L, "https://a.com/P?k=2"),                      // different query
      (9L, "not a url at all"),                         // null canonical
      (10L, "also not a url")                           // null canonical
    ).toDF("doc_id", "url")
    val kept = Domains.dedupByCanonicalUrl(docs, "url", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 9L, 10L))
  }

  test("applyBlocklist: suffix-chain matching — whole domains, exact hosts, never substrings") {
    val docs = Seq(
      (1L, "ads.tracker.example.com"),   // parent example.com blocked
      (2L, "example.com"),               // exact
      (3L, "notexample.com"),            // substring must NOT match
      (4L, "good.org"),
      (5L, "bad.good.org"),              // exact host blocked below
      (6L, null.asInstanceOf[String])    // null host passes
    ).toDF("doc_id", "host")
    val kept = Domains.applyBlocklist(docs, "host",
        Seq("example.com", "bad.good.org"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L, 6L))
    // empty blocklist is the identity
    assert(Domains.applyBlocklist(docs, "host", Seq.empty).count() === 6L)
  }

  test("applyBlocklist normalizes both sides: ports, case, trailing dots") {
    val docs = Seq(
      (1L, "example.com:8080"),          // urlHost keeps non-default ports
      (2L, "Sub.EXAMPLE.com"),           // mixed-case host
      (3L, "example.com."),              // FQDN trailing dot
      (4L, "fine.org:8080"),
      (5L, "tracker.net")                // blocked via an UPPERCASE+dot entry
    ).toDF("doc_id", "host")
    val kept = Domains.applyBlocklist(docs, "host",
        Seq("EXAMPLE.com", "Tracker.NET."))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(4L))
    // a blocklist that normalizes to empty entries is the identity
    assert(Domains.applyBlocklist(docs, "host", Seq(".", "")).count() === 5L)
  }

  test("applyBlocklist is a map-side predicate: zero exchanges") {
    val docs = Seq((1L, "a.b.c")).toDF("doc_id", "host")
    val plan = Domains.applyBlocklist(docs, "host", Seq("x.com"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("domainQualityFilter: both thresholds bite; null hosts pass; routes agree") {
    val docs = Seq(
      (1L, Some("good.com"), 0.9), (2L, Some("good.com"), 0.8),      // mean .85, n=2
      (3L, Some("bad.com"), 0.2), (4L, Some("bad.com"), 0.3),        // mean .25 → cut by mean
      (5L, Some("thin.com"), 1.0),                                   // n=1 → cut by minDocs
      (6L, None, 0.0)                                                // no host → passes
    ).toDF("doc_id", "host", "score")
    def run(bcast: Boolean) = Domains.domainQualityFilter(
        docs, "host", "score", minDocs = 2L, minMeanScore = 0.5,
        broadcastStats = bcast)
      .select("doc_id").as[Long].collect().toSet
    val b = run(bcast = true)
    assert(b === Set(1L, 2L, 6L))
    // the shuffled-stats route (too many domains to broadcast) agrees
    assert(run(bcast = false) === b)
    // a domain is judged wholesale: good.com's weak page 2 survives
    // BECAUSE its domain mean clears the bar, while thin.com's perfect
    // page dies with its domain
    assert(b.contains(2L) && !b.contains(5L))
  }

  test("domainQualityFilter: defaults are the identity for hosted docs; bad minDocs rejected") {
    val docs = Seq((1L, "a.com", 0.1), (2L, "b.com", 0.0))
      .toDF("doc_id", "host", "score")
    assert(Domains.domainQualityFilter(docs, "host", "score").count() === 2L)
    intercept[IllegalArgumentException] {
      Domains.domainQualityFilter(docs, "host", "score", minDocs = 0L)
    }
  }

  test("domainQualityFilter broadcasts the qualifying-host frame (corpus never shuffles for the probe)") {
    val docs = Seq((1L, "a.com", 0.9)).toDF("doc_id", "host", "score")
    val plan = Domains.domainQualityFilter(docs, "host", "score")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }
}
