package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-Pair-Encoding vocabulary learning (Sennrich et al. 2016,
  * re-derived) — the tokenizer-training step of a data pipeline: learn
  * the merge table from the corpus the model will train on, then encode
  * with it (or ship it to a real tokenizer).
  *
  * The scale insight that makes BPE tractable at 100 TB: learning never
  * iterates over the CORPUS — it iterates over the distinct-WORD
  * frequency dictionary, which is Zipf-bounded (a 100 TB crawl has
  * ~10⁷–10⁸ distinct words, not 10¹³). So the corpus is touched exactly
  * once (one tokenize + count shuffle, [[wordFrequencies]]), and
  * [[learnMerges]] hybrid-routes the merge loop on the dictionary's
  * size: under the cap (every real corpus) the loop runs single-process
  * over the collected dictionary; over it, the distributed iteration
  * takes over — adjacent symbol pairs explode map-side via array HOFs,
  * one (left, right) hash aggregation with partial sums, a 1-row
  * `TakeOrdered` argmax (count DESC, pair ASC — ties deterministic),
  * and the merge applies as a codegen'd `aggregate` HOF fold (greedy
  * leftmost non-overlapping, the classic rule) — no UDF on either path.
  *
  * Distributed-iteration hygiene follows `Dedup.connectedComponentsDistributed`:
  * the dictionary persists across iterations (each pair count reads the
  * CACHED frame, not the re-derived lineage), lineage truncates with
  * `localCheckpoint` every few merges so the plan doesn't grow per
  * iteration, and the previous iteration's cache releases as soon as
  * the next materializes.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** (word, freq) over whitespace tokens — the ONE corpus-wide pass. */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.where(col(s"`$textCol`").isNotNull &&
        length(trim(col(s"`$textCol`"))) > 0)
      .select(explode(graft.functions.TextFns.tokens(col(s"`$textCol`"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Characters of `word` as an array<string> of single-char symbols. */
  private def charSymbols(word: Column): Column =
    filter(split(word, ""), s => length(s) > 0)

  /** Adjacent symbol pairs of `syms` as (l, r) structs — map-side. */
  private def adjacentPairs(syms: Column): Column =
    transform(
      filter(sequence(lit(1), size(syms)), p => p < size(syms)),
      p => struct(element_at(syms, p).as("l"), element_at(syms, p + 1).as("r")))

  /** Greedy leftmost non-overlapping application of merge (l, r) to a
    * symbol array, as a stateful `aggregate` fold: carry (emitted, prev);
    * when prev == l and the next symbol == r, emit the merged token and
    * clear prev — so "a a a" under (a, a) becomes "aa a", never "aa aa"
    * overlapped.
    */
  private def applyMergeCol(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      struct(array().cast("array<string>").as("out"),
        lit(null).cast("string").as("prev")),
      (st, s) =>
        when(st.getField("prev") === lit(l) && s === lit(r),
          struct(concat(st.getField("out"), array(lit(l + r))).as("out"),
            lit(null).cast("string").as("prev")))
        .when(st.getField("prev").isNull,
          struct(st.getField("out").as("out"), s.as("prev")))
        .otherwise(
          struct(concat(st.getField("out"), array(st.getField("prev"))).as("out"),
            s.as("prev"))),
      st => when(st.getField("prev").isNull, st.getField("out"))
        .otherwise(concat(st.getField("out"), array(st.getField("prev")))))

  /** Learn up to `numMerges` merges from a (word, freq) frame — the
    * PRODUCTION entry point, hybrid-routed like
    * `Dedup.connectedComponents`: a count probe sizes the dictionary,
    * and under `localDictCap` the merge loop runs single-process over
    * the collected dictionary ([[learnMergesLocal]]); only an over-cap
    * dictionary takes the distributed iteration.
    *
    * The local path is the correct default for EVERY real corpus: the
    * distinct-word dictionary is Zipf-bounded (~10⁶–10⁸ rows at 100 TB,
    * each a short string + count — hundreds of MB at worst), while a
    * realistic tokenizer vocab is ~32k merges, and the distributed loop
    * pays ~2 Spark jobs plus a full dictionary rewrite PER MERGE (~64k
    * jobs at 32k merges — driver-loop seconds dwarfing the actual work).
    * Locally those 32k merges are one in-memory loop. The corpus itself
    * is never part of either loop — [[wordFrequencies]] touched it
    * exactly once. Both paths share the same determinism contract
    * (greedy leftmost application; ties by count DESC then unsigned
    * UTF-8 byte order of left, right), pinned merge-for-merge by
    * BpeSpec's routing parity and q123's gate.
    */
  def learnMerges(wordFreq: DataFrame, numMerges: Int,
                  localDictCap: Long = 4000000L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val typed = wordFreq
      .select(col("word").cast("string"), col("freq").cast("long"))
      .as[(String, Long)]
    // Persisted across the probe (the connectedComponents idiom): the
    // probe and the follow-up (collect or the distributed loop's first
    // pass) would otherwise each re-run the upstream corpus tokenize +
    // count shuffle.
    typed.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val overCap = typed.limit((localDictCap + 1).toInt).count() > localDictCap
      if (overCap) learnMergesDistributed(typed.toDF("word", "freq"), numMerges)
      else learnMergesLocal(typed.collect().toSeq, numMerges)
    } finally typed.unpersist()
  }

  /** The distributed merge iteration — [[learnMerges]]' over-cap
    * fallback (a dictionary too large to collect: adversarial key
    * spaces, not natural language). Each merge costs one argmax job
    * plus one rewrite of the dictionary; stops early when no adjacent
    * pair remains (every word fully merged).
    */
  def learnMergesDistributed(wordFreq: DataFrame, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val merges = Seq.newBuilder[Merge]
    var dict = wordFreq
      .select(charSymbols(col("word")).as("syms"), col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val best = dict.where(size(col("syms")) >= 2)
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(rank, l, r, c)
        val prev = dict
        var next = dict.select(applyMergeCol(col("syms"), l, r).as("syms"), col("freq"))
        // truncate lineage periodically — each merge nests one aggregate
        // HOF, and K nested folds make analysis cost quadratic in K
        if ((rank + 1) % 4 == 0) next = next.localCheckpoint(true)
        else {
          next = next.persist(StorageLevel.MEMORY_AND_DISK)
          next.count()
        }
        prev.unpersist()
        dict = next
        rank += 1
      }
    }
    dict.unpersist()
    merges.result()
  }

  /** Single-process reference implementation over a collected dictionary
    * — the independent recomposition the q123 gate compares against, and
    * the right tool when the dictionary is small anyway. Same
    * determinism contract: greedy leftmost application, ties by
    * (count DESC, left ASC, right ASC).
    */
  def learnMergesLocal(freq: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var dict = freq.map { case (w, c) => (codePointSymbols(w), c) }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // ties break by UNSIGNED UTF-8 byte order — Spark's binary string
        // sort — not String.compareTo (UTF-16 units), which disagrees on
        // supplementary characters
        val ((l, r), c) = counts.reduceLeft { (a, b) =>
          if (b._2 > a._2 ||
            (b._2 == a._2 && (utf8Lt(b._1._1, a._1._1) ||
              (b._1._1 == a._1._1 && utf8Lt(b._1._2, a._1._2))))) b else a
        }
        merges += Merge(rank, l, r, c)
        dict = dict.map { case (syms, cnt) => (mergeWord(syms, l, r), cnt) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Code-POINT symbols (a surrogate pair is one symbol — matching
    * Spark's `split` semantics; `String.map(_.toString)` would shear
    * supplementary characters into broken halves).
    */
  private def codePointSymbols(w: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  private def mergeWord(syms: Array[String], l: String, r: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode a corpus with a learned merge table: per doc, tokenize,
    * apply merges in rank order per word, return (id, bpe tokens, token
    * count). The merge ranks broadcast (vocab-sized); application is the
    * standard lowest-rank-first loop per word — per-row imperative by
    * nature, so a typed map, with everything around it columnar.
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
             merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = spark.sparkContext.broadcast(ranks)
    df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").cast("long").as("id"),
        graft.functions.TextFns.tokens(col(s"`$textCol`")).as("toks"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) =>
        val enc = toks.flatMap(w => encodeWord(w, bc.value))
        (id, enc, enc.length.toLong)
      }
      .toDF("id", "bpe_tokens", "n_bpe_tokens")
  }

  /** [[encode]] by a structurally different route — merges applied in
    * RANK ORDER as successive columnar [[applyMergeCol]] passes over
    * per-word symbol arrays (the learning path's rewrite expression),
    * then words reassembled in document order. For a LEARNED merge
    * table the two routes provably agree: a pair learned at rank j can
    * only mention symbols created before j, so applying rank k never
    * re-creates a lower-rank pair, making rank-order exhaustive
    * application identical to [[encodeWord]]'s lowest-present-rank
    * loop. VERIFICATION route: plan depth grows with the merge count
    * (one fold expression per merge), so it is the cross-check for
    * demo-sized tables (q130's gate), not the 32k-merge serving path.
    * The fold runs over the DISTINCT word dictionary and joins back by
    * word — encoding is per-word, so the deep (interpreted) fold
    * expression evaluates once per Zipf-bounded dictionary entry, not
    * once per corpus word instance (measured 25s → dictionary-sized on
    * the bench corpus).
    */
  def encodeColumnar(df: DataFrame, textCol: String, idCol: String,
                     merges: Seq[Merge]): DataFrame = {
    val words = df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").cast("long").as("id"),
        posexplode(graft.functions.TextFns.tokens(col(s"`$textCol`")))
          .as(Seq("pos", "word")))
    val syms = merges.sortBy(_.rank).foldLeft(charSymbols(col("word"))) {
      (acc, m) => applyMergeCol(acc, m.left, m.right)
    }
    val dictEncoded = words.select("word").distinct()
      .select(col("word"), syms.as("toks"))
    words.join(dictEncoded, "word")
      .groupBy("id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        s => s.getField("toks"))).as("bpe_tokens"))
      .select(col("id"), col("bpe_tokens"),
        size(col("bpe_tokens")).cast("long").as("n_bpe_tokens"))
  }

  /** Standard BPE encode of one word: repeatedly apply the present pair
    * with the lowest merge rank until none applies.
    */
  private[graft] def encodeWord(word: String,
                                ranks: Map[(String, String), Int]): Seq[String] = {
    // code-POINT symbols, matching both learning paths: UTF-16-unit
    // symbolization (word.map(_.toString)) would shear supplementary
    // characters into surrogate halves the merge table can never match
    var syms = codePointSymbols(word)
    var cont = syms.length >= 2
    while (cont) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < syms.length) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bi = i }
        i += 1
      }
      if (bi < 0) cont = false
      else {
        syms = mergeWord(syms, syms(bi), syms(bi + 1))
        cont = syms.length >= 2
      }
    }
    syms.toSeq
  }
}
