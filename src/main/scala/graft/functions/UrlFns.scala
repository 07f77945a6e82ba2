package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + host extraction — the keys a web-scale
  * training-data pipeline dedups, caps, and mixes on (CCNet, C4 and
  * RefinedWeb all group by URL/host before content-level dedup; the
  * reference's filename-metadata extraction — SURVEY §2 S4 — is the
  * same move one level down: derive the grouping identity from the
  * record's address, not its content).
  *
  * Everything here is a pure composition of built-in column functions
  * (regexp_extract / regexp_replace / lower / concat): map-side,
  * whole-stage-codegen'd, zero shuffle, and — deliberately — regex
  * semantics DuckDB reproduces verbatim, so the driver oracles mirror
  * this pipeline rather than trusting it.
  *
  * Canonical form: `scheme://host/path?query` with
  *   - scheme and host lowercased (path/query case PRESERVED — many
  *     servers are case-sensitive past the authority);
  *   - a leading `www.` stripped from the host;
  *   - the scheme's default port stripped (`:80` for http, `:443` for
  *     https); non-default ports kept;
  *   - the fragment dropped (never sent to the server);
  *   - tracking parameters dropped from the query (`utm_*`, `gclid`,
  *     `fbclid`, `ref`, `mc_cid`, `mc_eid`), the `?` dropped too when
  *     nothing survives; surviving parameter ORDER is preserved
  *     (reordering would conflate `?a=1&b=2` with `?b=2&a=1`, which
  *     some endpoints treat differently);
  *   - trailing `/` stripped from the path.
  */
object UrlFns {

  /** Query parameters that carry campaign/click identity, not resource
    * identity — the standard strip set.
    */
  val trackingParams: String = "utm_[A-Za-z0-9_]*|gclid|fbclid|ref|mc_cid|mc_eid"

  /** Lowercased scheme; empty when `url` has no `scheme://` prefix. */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host (with any NON-default port kept): `www.` stripped,
    * `:80`/`:443` stripped under their own scheme only.
    */
  def urlHost(url: Column): Column = {
    val hp = regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", "")
    val sch = urlScheme(url)
    when(sch === "http", regexp_replace(hp, ":80$", ""))
      .when(sch === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
  }

  /** RAW path, case and trailing slashes preserved; `/` when the URL has
    * no path segment (the robots-matching view — `/dir/` and `/dir` are
    * different robots targets, and canonicalization must not decide
    * compliance).
    */
  def urlRawPath(url: Column): Column = {
    val p = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    when(p === "", "/").otherwise(p)
  }

  /** Path with trailing slashes stripped, case preserved. */
  def urlPath(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")

  /** Query with tracking parameters removed (order of survivors
    * preserved); empty when none survive. The strip pattern anchors on
    * start-or-`&` so a parameter NAMED like a tracked one mid-name
    * (`xutm_source=`) is not clipped.
    */
  def urlQuery(url: Column): Column = {
    val q0 = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*\\?([^#]*)", 1)
    regexp_replace(
      regexp_replace(q0, s"(^|&)($trackingParams)=[^&]*", ""),
      "^&", "")
  }

  /** The full canonical URL (see object doc for the exact contract). */
  def canonicalUrl(url: Column): Column = {
    val q = urlQuery(url)
    concat(urlScheme(url), lit("://"), urlHost(url), urlPath(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
