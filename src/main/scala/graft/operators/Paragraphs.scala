package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sub-document (paragraph-granular) near-duplicate detection — the
  * standard web-pipeline refinement over whole-document dedup: a page that
  * copies one boilerplate paragraph from another page is invisible to
  * doc-level Jaccard but lights up at paragraph granularity (the unit
  * CCNet and the C4 pipeline dedup at).
  *
  * Deliberately COMPOSITIONAL: the splitters below emit one normalized
  * (id, para_idx, para) stream, and [[nearDupDocPairs]] runs the existing
  * MinHash-LSH machinery ([[Dedup.ngramJaccardViaLsh]] — banded blocking +
  * exact-Jaccard verification) over the paragraphs, then re-aggregates
  * paragraph hits into document verdicts. No new kernels; the paragraph
  * stream is larger than the doc stream by a constant factor and every
  * downstream shuffle is the dedup family's own (banding + verify).
  */
object Paragraphs {

  /** (id, para_idx, para) by the real-world layout rule: paragraphs are
    * blank-line-separated blocks. Map-side split + posexplode; empty
    * blocks (runs of blank lines) are dropped, indices keep their
    * positional order.
    */
  def splitBlankLines(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"),
        posexplode(split(col(s"`$textCol`"), "\\n\\s*\\n")).as(Seq("para_idx", "para")))
      .where(length(trim(col("para"))) > 0)

  /** (id, para_idx, para) by fixed token windows — the segmentation for
    * corpora WITHOUT layout (single-line text): window-sized token slices
    * in order. One map-side higher-order-function projection (split →
    * slice → rejoin), no shuffle.
    */
  def splitTokenWindows(df: DataFrame, textCol: String, idCol: String,
                        window: Int): DataFrame = {
    require(window > 0, "window must be positive")
    df.where(col(s"`$textCol`").isNotNull && length(trim(col(s"`$textCol`"))) > 0)
      .select(col(s"`$idCol`").as("id"), split(trim(col(s"`$textCol`")), "\\s+").as("__toks"))
      .select(col("id"),
        posexplode(expr(
          s"transform(sequence(0, (size(__toks)-1) div $window), " +
            s"i -> array_join(slice(__toks, i*$window+1, $window), ' '))"))
          .as(Seq("para_idx", "para")))
  }

  /** Document-pair near-dup verdicts from a paragraph stream: paragraph
    * pairs at or above the Jaccard threshold aggregate to
    * (doc_a, doc_b, n_para_pairs, max_jaccard) across DISTINCT documents
    * (intra-document repetition is q65/q73's signal, not this one's).
    *
    * `viaLsh = true` blocks candidates with MinHash banding + exact
    * verification (the corpus-scale path — emitted pairs are never false
    * positives, but banding recall is probabilistic near the threshold:
    * short tail-window paragraphs with 1-2 shingles sit exactly there, so
    * an LSH run may miss borderline pairs). `viaLsh = false` runs the
    * EXACT inverted-shingle-index path ([[Dedup.ngramJaccardPairs]], the
    * skew-guarded q38 operator): any pair with J >= t shares a shingle,
    * so every qualifying pair is found — the oracle-checkable route.
    *
    * Paragraph keys pack (id, para_idx) into one long — `id` must be a
    * non-negative integral id below `Long.MaxValue / idxCap` and
    * documents must hold fewer than `idxCap` paragraphs (BOTH enforced
    * in-plan: an overflowing term would silently alias another
    * document's key).
    */
  def nearDupDocPairs(paras: DataFrame, shingleN: Int, threshold: Double,
                      viaLsh: Boolean = true,
                      numHashes: Int = 64, bands: Int = 16,
                      idxCap: Long = 1000000L): DataFrame = {
    val keyed = packKeys(paras, idxCap)
    val pairs =
      if (viaLsh) Dedup.ngramJaccardViaLsh(keyed, "para", "pkey",
        n = shingleN, threshold = threshold, numHashes = numHashes, bands = bands)
      else Dedup.ngramJaccardPairs(keyed, "para", "pkey",
        n = shingleN, threshold = threshold)
    aggregateDocPairs(pairs, idxCap)
  }

  /** [[nearDupDocPairs]] with the route chosen PER PARAGRAPH by length:
    * LSH banding recall is probabilistic near the threshold for
    * paragraphs with only a handful of shingles (the q77 finding), so
    * paragraphs under `lshMinShingles` shingles go through the exact
    * inverted-index route and the rest through LSH.
    *
    * Routing is LOSSLESS for qualifying pairs: J >= t forces
    * |small| / |big| >= t on shingle-set sizes, so a pair with a
    * sub-floor side has BOTH sides below ceil(floor / t) — the exact
    * route's cutoff includes that margin, and a pair with both sides at
    * or above the floor is LSH's. Pairs in the margin zone
    * [floor, ceil(floor/t)) can be found by both routes (both verify the
    * same exact Jaccard) — deduplicated before aggregation.
    */
  /** @param knownMaxShingles a caller-guaranteed upper bound on any
    *   paragraph's shingle count, when one exists by construction —
    *   [[splitTokenWindows]] output is bounded at `window - shingleN + 1`
    *   — letting the router decide statically instead of probing the data.
    */
  def nearDupDocPairsAuto(paras: DataFrame, shingleN: Int, threshold: Double,
                          numHashes: Int = 64, bands: Int = 16,
                          lshMinShingles: Int = 8,
                          idxCap: Long = 1000000L,
                          knownMaxShingles: Option[Int] = None): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    require(lshMinShingles > 0, "lshMinShingles must be positive")
    val keyed = packKeys(paras, idxCap)
    // Route on the DISTINCT-shingle-set size — the quantity the lossless-
    // margin proof is actually about. A token-derived count (tokens-n+1)
    // overestimates it on repetitive text: a boilerplate paragraph with
    // many tokens but few distinct shingles would be excluded from the
    // exact route while its short duplicate partner is excluded from LSH,
    // and the pair would be missed by both. wordShingles is the same
    // kernel the pair operators shingle with, so the routed quantity and
    // the verified quantity agree by construction.
    val cnt = size(graft.functions.SketchExpressions
      .wordShingles(col("para"), shingleN))
    val exactCap = math.ceil(lshMinShingles / threshold).toLong
    // Adaptive shortcut: with NO paragraph at or above the exact cutoff,
    // every qualifying pair has both sides under it — the exact route
    // alone is complete and the LSH pass (which would redundantly
    // re-process the whole margin zone) is skipped. Decided statically
    // when the caller can bound paragraph length (token-window split);
    // otherwise a LIMIT-1 existence probe.
    val anyLong = knownMaxShingles match {
      case Some(m) => m >= exactCap
      case None => keyed.where(cnt >= exactCap).limit(1).count() > 0
    }
    val pairs =
      if (!anyLong)
        Dedup.ngramJaccardPairs(keyed, "para", "pkey",
          n = shingleN, threshold = threshold)
      else
        Dedup.ngramJaccardPairs(keyed.where(cnt < exactCap),
            "para", "pkey", n = shingleN, threshold = threshold)
          .unionByName(Dedup.ngramJaccardViaLsh(keyed.where(cnt >= lshMinShingles),
            "para", "pkey", n = shingleN, threshold = threshold,
            numHashes = numHashes, bands = bands))
          .dropDuplicates("id_a", "id_b")
    aggregateDocPairs(pairs, idxCap)
  }

  /** Pack (id, para_idx) into one long key, raising IN-PLAN on any value
    * that would alias across documents: a paragraph index at or above
    * `idxCap`, a negative doc id, or a doc id at or above
    * `Long.MaxValue / idxCap` (the packed key `id * idxCap + idx` would
    * wrap silently — ids up to ~9.2e12 at the default cap are safe).
    */
  private def packKeys(paras: DataFrame, idxCap: Long): DataFrame = {
    val safeIdx = when(col("para_idx").cast("long") >= idxCap,
        raise_error(concat(lit("paragraph index overflows the packed key: "),
          col("para_idx").cast("string"))))
      .otherwise(col("para_idx").cast("long"))
    val id = col("id").cast("long")
    val safeId = when(id < 0L || id >= Long.MaxValue / idxCap,
        raise_error(concat(lit("doc id overflows the packed key: "),
          col("id").cast("string"))))
      .otherwise(id)
    paras.select((safeId * idxCap + safeIdx).as("pkey"), col("para"))
  }

  private def aggregateDocPairs(pairs: DataFrame, idxCap: Long): DataFrame =
    pairs
      .select(expr(s"id_a div $idxCap").as("doc_a"),
        expr(s"id_b div $idxCap").as("doc_b"), col("jaccard"))
      .where(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_para_pairs"), max(col("jaccard")).as("max_jaccard"))

  /** CCNet's paragraph-hash deduplication, per shard: within each
    * `shardCol` group (the LANGUAGE shard in the CCNet composition —
    * CCNet hashes paragraphs per language shard so boilerplate shared
    * across pages is stored once), every distinct paragraph fingerprint
    * (q31's [[graft.functions.TextFns.fingerprint]] convention) keeps only
    * its FIRST occurrence — minimum (`idCol`, paragraph position) — and
    * all later copies are dropped. Documents are re-assembled from their
    * surviving paragraphs in positional order; a document whose every
    * paragraph was someone else's copy disappears entirely. Reference
    * keep-first idiom: A1 (`candidate/transform.py:16-68`).
    *
    * All non-text columns ride through unchanged; the output schema and
    * column order equal the input's. A document with a NULL text value
    * or no non-blank paragraph after the split is DROPPED (it has no
    * surviving paragraph to re-assemble from) — the same fate as an
    * all-copies document, and the same contract as the streaming twin
    * ([[graft.streaming.StreamingParagraphDedup]]), so one-shot and
    * incremental runs agree on degenerate inputs.
    *
    * `splitRegex`/`joinSep` default to the raw-layout convention
    * (blank-line paragraphs, [[splitBlankLines]]). Text that came
    * through [[graft.functions.HtmlTextExpr]] carries ONE newline per
    * block boundary (its whitespace contract collapses newline runs) —
    * pass `splitRegex = "\\n", joinSep = "\n"` so extracted blocks
    * dedup as paragraphs (the q164 crawl-path convention).
    *
    * Scale shape — deliberately NO window over (shard, fingerprint): a
    * boilerplate paragraph duplicated across the whole corpus would
    * funnel its entire copy set into one window partition. Instead the
    * winner per (shard, fingerprint) is a `min_by` hash-aggregate —
    * map-side partial minima reduce the copy set before the shuffle, so
    * the hottest paragraph costs one row per input partition. Two
    * shuffles total: the winner aggregate and the per-document
    * re-assembly.
    */
  /** [[dedupFirstByShard]] with a single corpus-global shard — the
    * RefinedWeb/C4 flavor (exact repeated paragraphs cut corpus-wide,
    * keep-first), for pipelines without a language column. Same
    * aggregate shape: the constant shard changes nothing about the
    * map-side reduction.
    */
  def dedupFirst(df: DataFrame, textCol: String, idCol: String,
                 splitRegex: String = "\\n\\s*\\n",
                 joinSep: String = "\n\n"): DataFrame = {
    require(!df.columns.contains("__ph_shard"),
      "dedupFirst reserves the __ph_shard column name")
    dedupFirstByShard(df.withColumn("__ph_shard", lit(1)),
      textCol, idCol, "__ph_shard", splitRegex, joinSep)
      .drop("__ph_shard")
  }

  def dedupFirstByShard(df: DataFrame, textCol: String, idCol: String,
                        shardCol: String,
                        splitRegex: String = "\\n\\s*\\n",
                        joinSep: String = "\n\n"): DataFrame = {
    val carried = df.columns.filterNot(_ == textCol)
    val paras = df.where(col(s"`$textCol`").isNotNull)
      .select(carried.map(c => col(s"`$c`")) :+
        posexplode(split(col(s"`$textCol`"), splitRegex))
          .as(Seq("para_idx", "para")): _*)
      .where(length(trim(col("para"))) > 0)
    // The splitter already dropped blank paragraphs, and normalize falls
    // back to the raw (non-blank) text when the cleaned form is empty, so
    // the fingerprint needs no q31 empty-key arm here.
    val allCols = paras.columns.map(c => col(s"`$c`"))
    val winners = paras
      .withColumn("__fp", graft.functions.TextFns.fingerprint(col("para")))
      .groupBy(col(s"`$shardCol`").as("__shard"), col("__fp"))
      .agg(min_by(struct(allCols: _*),
        struct(col(s"`$idCol`"), col("para_idx"))).as("__w"))
      .select(col("__w.*"))
    winners
      .groupBy(carried.map(c => col(s"`$c`")): _*)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("para_idx"), col("para")))),
          x => x.getField("para")), joinSep).as(textCol))
      .select(df.columns.map(c => col(s"`$c`")): _*)
  }
}
