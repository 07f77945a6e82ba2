package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  * All pure Column expressions (codegen-friendly, no UDFs).
  */
object TextFns {

  /** Whitespace tokens of a document; empty/blank text -> empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count; blank text counts 0. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word token estimate: word-pieces + digits + punctuation
    * via the common `\w+|[^\w\s]` pre-tokenizer pattern (match-based, no
    * lookarounds — RE2-portable and codegen'd).
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))

  /** Word n-gram shingles (space-joined) over whitespace tokens.
    * Documents shorter than n tokens yield a single shingle of all tokens.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    when(size(ts) <= n, array(concat_ws(" ", ts)))
      .otherwise(
        transform(
          sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", slice(ts, i + 1, lit(n)))
        )
      )
  }

  /** Character n-gram shingles of the normalized text. */
  def charShingles(text: Column, n: Int): Column = {
    val t = normalize(text)
    when(length(t) <= n, array(t))
      .otherwise(
        transform(
          sequence(lit(1), length(t) - (n - 1)),
          i => t.substr(i, lit(n))
        )
      )
  }

  /** Lowercase, collapse whitespace, strip punctuation/symbols — canonical
    * form for exact/fuzzy dedup fingerprints. Unicode-aware: keeps any
    * letter or digit (`\p{L}\p{N}`), not just ASCII, so Chinese / Cyrillic /
    * Arabic documents don't all normalize to the same empty string (which
    * would collapse an entire non-Latin corpus to one row in dedup). When
    * normalization still yields empty (e.g. emoji-only text), falls back to
    * the raw trimmed text so distinct contents keep distinct fingerprints.
    */
  def normalize(text: Column): Column = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]", " "), "\\s+", " "))
    when(length(cleaned) === 0, trim(text)).otherwise(cleaned)
  }

  /** MD5 fingerprint of normalized text (exact-dedup key; mirrors the
    * reference's content-hash dedup idea, `utils/hash.py:8-30`).
    * Normalization runs through the single-pass kernel
    * ([[SketchExpressions.normText]], spec-agreed with [[normalize]]) —
    * the composed-Column form chains two regex replaces per use site.
    */
  def fingerprint(text: Column): Column =
    md5(SketchExpressions.normText(text))

  /** 64-bit rolling-style document fingerprint (xxhash64 of normalization). */
  def fingerprint64(text: Column): Column =
    xxhash64(SketchExpressions.normText(text))

  /** Encoding-damage counters: U+FFFD replacement characters (the
    * tombstone every lossy transcode leaves behind) and C0 control
    * characters other than tab/newline/CR (binary junk that leaked into
    * "text"). Both are plain length differences after a removal — fully
    * codegen'd, no per-char UDF.
    */
  def replacementCharCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "�", ""))).cast("long")

  def controlCharCount(text: Column): Column =
    (length(text) - length(regexp_replace(text,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""))).cast("long")

  /** Damage ratio: (replacement + control chars) / chars, 0.0 for empty —
    * the mojibake / binary-leak filter signal (CCNet-style pipelines drop
    * or re-decode docs above a small threshold).
    */
  def encodingDamageRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise((replacementCharCount(text) + controlCharCount(text))
        .cast("double") / length(text))

  /** Ratio of punctuation chars to total chars (0 for empty). */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, 0.0d)
      .otherwise(
        (total - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
          / total.cast("double")
      )
  }

  /** Ratio of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val stops = Array("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "it", "that", "this", "for", "on", "with", "as", "at", "by", "be")
    val ts = tokens(lower(text))
    when(size(ts) === 0, 0.0d)
      .otherwise(
        size(filter(ts, t => t.isin(stops.map(x => x: Any): _*))).cast("double")
          / size(ts).cast("double")
      )
  }

  /** Mean token length in characters (0 for empty). */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0d)
      .otherwise(
        aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double")
          / size(ts).cast("double")
      )
  }

  /** Composite [0,1] quality score: penalizes very short docs, extreme
    * punctuation density, and stopword-free (non-linguistic) text.
    */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(tokenCount(text).cast("double") / 20.0d, lit(1.0d))
    val punctPen  = greatest(lit(0.0d), lit(1.0d) - punctRatio(text) * 4.0d)
    val stopScore = least(stopwordRatio(text) * 5.0d, lit(1.0d))
    round(lenScore * 0.5d + punctPen * 0.25d + stopScore * 0.25d, 6)
  }

  /** All text signals in one pass over a PRE-TOKENIZED column — the
    * annotate-stage fast path: the naive composition re-evaluates the
    * (interpreted) tokenization inside every metric; here `toks` is a real
    * column computed once. Returns a struct
    * (n_tokens, stopword_ratio, mean_token_len, lang_pred).
    */
  def tokenMetrics(toks: Column): Column = {
    val lower = transform(toks, t => org.apache.spark.sql.functions.lower(t))
    val stops = Array("the", "a", "an", "and", "or", "of", "to", "in", "is",
      "it", "that", "this", "for", "on", "with", "as", "at", "by", "be")
    val n = size(toks)
    val nStop = size(filter(lower, t => t.isin(stops.map(x => x: Any): _*)))
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
      "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans"),
      "es" -> Seq("el", "los", "las", "es", "una", "que", "por", "para", "como"),
      "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人"))
    val scored = markers.map { case (lang, words) =>
      struct(size(filter(lower, t => t.isin(words.map(x => x: Any): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    struct(
      n.cast("long").as("n_tokens"),
      when(n === 0, 0.0d).otherwise(nStop.cast("double") / n.cast("double")).as("stopword_ratio"),
      when(n === 0, 0.0d).otherwise(sumLen.cast("double") / n.cast("double")).as("mean_token_len"),
      when(n === 0 || best.getField("score") === 0, "und")
        .otherwise(best.getField("lang")).as("lang_pred"))
  }

  /** Language-ID heuristic: scores text against per-language stopword/char
    * marker sets, returns the argmax language code (or "und").
    * N-gram-free approximation good enough for routing; NOT a model.
    */
  def langIdHeuristic(text: Column): Column =
    langIdOfTokens(tokens(lower(text)))

  /** The same argmax scorer over an already-tokenized (lowercased) token
    * array — shared by the per-document heuristic above and window-level
    * consumers ([[graft.operators.TextStats.langConsistency]]).
    */
  def langIdOfTokens(ts: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "with"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
      "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans"),
      "es" -> Seq("el", "los", "las", "es", "una", "que", "por", "para", "como"),
      "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不", "人")
    )
    val scored = markers.map { case (lang, words) =>
      struct(
        size(filter(ts, t => t.isin(words.map(x => x: Any): _*))).as("score"),
        lit(lang).as("lang")
      )
    }
    val best = array_max(array(scored: _*))
    when(size(ts) === 0 || best.getField("score") === 0, "und")
      .otherwise(best.getField("lang"))
  }
}
