package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass every public training-data pipeline
  * runs before release (the C4 / CCNet-style regex family: emails, phone
  * numbers, IP addresses). Pure `regexp_replace` chains: codegen'd,
  * map-side, zero shuffle — the 100 TB shape is a plain projection.
  *
  * Patterns are RE2-compatible (no lookaround/backreferences) so the same
  * expressions run verbatim in the DuckDB oracle, and conservative by
  * design: recall over precision is the norm for release scrubbing, but
  * each pattern anchors on structure (TLD, digit runs, dotted quads) to
  * avoid mangling ordinary prose.
  */
object Pii {

  /** (pattern, replacement token) in application order. Order matters:
    * emails go first so their host part is not half-eaten by the IP rule.
    */
  val rules: Seq[(String, String)] = Seq(
    // local@domain.tld — the local part may embed dots/plus tags
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    // dotted-quad IPv4 (word-bounded so version strings like 1.2.3 survive)
    ("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    // international/NANP-ish phone runs: 9+ digits with optional +, spaces,
    // dashes or dots between groups
    ("\\+?\\d[\\d .-]{7,}\\d", "<PHONE>")
  )

  /** The redacted text: every rule applied in order. */
  def redact(text: Column): Column =
    rules.foldLeft(text) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  /** Count of matches for one rule BEFORE redaction (size of the
    * regexp_extract_all array) — the per-document audit trail.
    */
  def matchCount(text: Column, pattern: String): Column =
    when(text.isNull, lit(0))
      .otherwise(size(regexp_extract_all(text, lit(pattern), lit(0))))
}
