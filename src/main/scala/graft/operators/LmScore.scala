package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring — the shape of CCNet's
  * perplexity filter (Wenzek et al., LREC'20) with the KenLM replaced by a
  * corpus-trained unigram model: documents whose tokens are improbable
  * under the background distribution (gibberish, boilerplate codes, wrong
  * language) score low and get filtered.
  *
  * Two stages, both linear:
  *   1. TRAIN: one hash aggregation over exploded tokens builds the
  *      unigram table p(t) = c(t) / N; the table is vocabulary-sized.
  *      Unseen tokens take the CALLER-SUPPLIED `oovLogp` floor at score
  *      time (pick e.g. log10(1/(N+|V|)) for add-one-style mass).
  *   2. SCORE: explode -> join the table -> per-doc mean of log10 p(t).
  *      The join side is NOT force-broadcast: a curated vocabulary is
  *      metadata-sized and AQE broadcasts it on its own, but a web-scale
  *      corpus's whitespace-token vocabulary is unbounded (typos, URLs,
  *      ids) — forcing the hint would bypass Spark's size threshold and
  *      OOM the driver instead of degrading to a shuffled hash join.
  *      One shuffle on the doc id; the corpus is never joined against
  *      itself.
  *
  * At 100 TB the table is trained once offline on a sample and reused —
  * the scoring pass is the only full-corpus scan.
  */
object LmScore {

  private def toks(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Unigram table (token, logp) with log10 probabilities. */
  def trainUnigram(df: DataFrame, textCol: String): DataFrame = {
    val t = df.where(col(s"`$textCol`").isNotNull)
      .select(explode(toks(col(s"`$textCol`"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val totalRow = t.agg(sum("c")).head()
    require(!totalRow.isNullAt(0) && totalRow.getLong(0) > 0,
      "trainUnigram needs a corpus with at least one token")
    val total = totalRow.getLong(0)
    t.select(col("token"), log10(col("c").cast("double") / total).as("logp"))
  }

  /** Linear-space unigram probabilities (token, p_uni) — the backoff
    * table for [[scoreDocsBigram]]'s interpolation (kept linear so the
    * interpolated sum λ·p_cond + (1−λ)·p_uni is computed exactly as
    * written, without a pow(10, log10(p)) round-trip).
    */
  def unigramProbs(df: DataFrame, textCol: String): DataFrame = {
    val t = df.where(col(s"`$textCol`").isNotNull)
      .select(explode(toks(col(s"`$textCol`"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val totalRow = t.agg(sum("c")).head()
    require(!totalRow.isNullAt(0) && totalRow.getLong(0) > 0,
      "unigramProbs needs a corpus with at least one token")
    val total = totalRow.getLong(0)
    t.select(col("token"), (col("c").cast("double") / total).as("p_uni"))
  }

  /** Conditional bigram probabilities (w1, w2, p_cond) with
    * p_cond = c(w1,w2) / Σ_w c(w1,w) — the maximum-likelihood conditional
    * over observed contexts. Two hash aggregations over the exploded
    * bigram stream (both map-side combinable), one broadcast-eligible
    * join of the context totals; vocabulary²-bounded output but Zipf-thin
    * in practice (only OBSERVED bigrams appear).
    */
  def bigramProbs(df: DataFrame, textCol: String): DataFrame = {
    val pairs = bigramPairs(df, textCol)
    val c2 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("__c"))
    val cs = c2.groupBy("w1").agg(sum("__c").as("__s"))
    c2.join(cs, Seq("w1"))
      .select(col("w1"), col("w2"),
        (col("__c").cast("double") / col("__s")).as("p_cond"))
  }

  /** (w1, w2) adjacent-token pairs of every document (docs with fewer
    * than two tokens emit none) — one map-side higher-order-function
    * projection + posexplode, no shuffle.
    */
  private def bigramPairs(df: DataFrame, textCol: String): DataFrame =
    df.where(col(s"`$textCol`").isNotNull)
      .select(col("*"), toks(col(s"`$textCol`")).as("__toks"))
      .where(size(col("__toks")) >= 2)
      .select(col("*"), explode(expr(
        "transform(sequence(1, size(__toks)-1), " +
          "i -> named_struct('w1', __toks[i-1], 'w2', __toks[i]))")).as("__bg"))
      .select(col("*"), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
      .drop("__toks", "__bg")

  /** Per-document mean BIGRAM log-probability under interpolation backoff
    * — the CCNet-faithful upgrade of [[scoreDocs]]: each adjacent pair
    * scores log10(λ·p(w2|w1) + (1−λ)·p(w2)), so unseen bigrams degrade
    * to the unigram channel instead of a hard floor and word-salad text
    * (every unigram common, bigrams improbable) scores low where the
    * unigram model cannot see it. `pFloor` is the linear-space unseen-
    * unigram mass (keeps the log argument positive); docs with fewer
    * than two tokens score `logFloor` with n_bigrams = 0.
    *
    * Same shuffle shape as [[scoreDocs]]: map-side pair stream, two
    * un-hinted table joins (AQE broadcasts small models, shuffles
    * unbounded ones), one doc-id aggregation.
    */
  def scoreDocsBigram(df: DataFrame, textCol: String, idCol: String,
                      bigram: DataFrame, unigramLin: DataFrame,
                      lambda: Double, pFloor: Double,
                      logFloor: Double): DataFrame = {
    // lambda == 1 zeroes the unigram channel, so an unseen bigram would
    // score log10(0 * 1 + p_uni * 0) = -Infinity and poison the doc mean
    // (pFloor only guards the unigram term). Pure-bigram scoring is not
    // interpolation backoff; require a real backoff weight.
    require(lambda >= 0 && lambda < 1, "lambda must be in [0, 1)")
    require(pFloor > 0, "pFloor must be positive (log argument)")
    val pairs = bigramPairs(
      df.where(col(s"`$textCol`").isNotNull)
        .select(col(s"`$idCol`").as("id"), col(s"`$textCol`")), textCol)
    val scored = pairs
      .join(bigram, Seq("w1", "w2"), "left")
      .join(unigramLin.select(col("token").as("w2"), col("p_uni")), Seq("w2"), "left")
      .select(col("id"),
        log10(coalesce(col("p_cond"), lit(0.0d)) * lambda +
          coalesce(col("p_uni"), lit(pFloor)) * (1.0d - lambda)).as("__lp"))
      .groupBy("id")
      .agg(avg("__lp").as("mean_logp"), count(lit(1)).as("n_bigrams"))
    df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("mean_logp"), lit(logFloor)).as("mean_logp"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
  }

  /** Per-document mean token log-probability under `unigram`. Unseen
    * tokens take the floor `log10(1/(N+1))`-style penalty passed in
    * `oovLogp`. Blank docs score the floor (nothing to attest quality).
    *
    * The unigram join carries NO broadcast hint: AQE broadcasts a small
    * vocabulary automatically and falls back to a shuffled join when the
    * vocabulary is too large to ship — the safe default at corpus scale.
    */
  /** Per-STRATUM unigram tables (stratum, token, logp) — CCNet trains
    * one LM per LANGUAGE, not one over the mixed corpus (a common
    * French word must not look improbable because the corpus is mostly
    * English). One plan, no per-language driver loop: a (stratum,
    * token) hash aggregation plus a stratum-total join; each stratum's
    * probabilities normalize over its OWN token mass. Strata with no
    * tokens simply have no rows (scoring against them falls to the OOV
    * floor — the "language absent from the corpus" case).
    */
  def trainUnigramBy(df: DataFrame, textCol: String,
                     strataCol: String): DataFrame = {
    val t = df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$strataCol`").as("stratum"),
        explode(toks(col(s"`$textCol`"))).as("token"))
      .groupBy("stratum", "token").agg(count(lit(1)).as("__c"))
    val tot = t.groupBy("stratum").agg(sum("__c").as("__t"))
    t.join(tot, Seq("stratum"))
      .select(col("stratum"), col("token"),
        log10(col("__c").cast("double") / col("__t")).as("logp"))
  }

  /** [[scoreDocs]] against [[trainUnigramBy]]'s per-stratum tables:
    * each document scores under ITS OWN stratum's model — the join key
    * is (stratum, token), so an English document never probes the
    * French table. Returns (id, stratum, mean_logp, n_tokens); docs in
    * a stratum the table never saw (or with no tokens) take the OOV
    * floor, never an error. Same shape as [[scoreDocs]]: one exploded
    * join + one (id, stratum) aggregation.
    */
  def scoreDocsBy(df: DataFrame, textCol: String, idCol: String,
                  strataCol: String, unigram: DataFrame,
                  oovLogp: Double): DataFrame = {
    val exploded = df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"), col(s"`$strataCol`").as("stratum"),
        explode(toks(col(s"`$textCol`"))).as("token"))
    val scored = exploded.join(unigram, Seq("stratum", "token"), "left")
      .groupBy("id", "stratum")
      .agg(avg(coalesce(col("logp"), lit(oovLogp))).as("mean_logp"),
        count(lit(1)).as("n_tokens"))
    df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"), col(s"`$strataCol`").as("stratum"))
      .join(scored, Seq("id", "stratum"), "left")
      .select(col("id"), col("stratum"),
        coalesce(col("mean_logp"), lit(oovLogp)).as("mean_logp"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }

  /** Per-stratum LINEAR unigram probabilities (stratum, token, p_uni) —
    * the λ₃ backoff channel of [[scoreDocsTrigramBy]]; the stratified
    * twin of [[unigramProbs]], same two map-side-combinable aggregations.
    */
  def unigramProbsBy(df: DataFrame, textCol: String,
                     strataCol: String): DataFrame = {
    val t = df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$strataCol`").as("stratum"),
        explode(toks(col(s"`$textCol`"))).as("token"))
      .groupBy("stratum", "token").agg(count(lit(1)).as("__c"))
    val tot = t.groupBy("stratum").agg(sum("__c").as("__t"))
    t.join(tot, Seq("stratum"))
      .select(col("stratum"), col("token"),
        (col("__c").cast("double") / col("__t")).as("p_uni"))
  }

  /** Per-stratum conditional bigram probabilities
    * (stratum, w1, w2, p_cond2) with p = c(w1,w2) / Σ_w c(w1,w) within
    * the stratum — the λ₂ channel. Observed-bigrams-only output
    * (Zipf-thin), two keyed aggregations + one join, exactly the
    * [[bigramProbs]] shape with the stratum riding every key.
    */
  def bigramCondProbsBy(df: DataFrame, textCol: String,
                        strataCol: String): DataFrame = {
    val c2 = ngramsBy(df, textCol, strataCol, 2)
      .groupBy("stratum", "w1", "w2").agg(count(lit(1)).as("__c"))
    val cs = c2.groupBy("stratum", "w1").agg(sum("__c").as("__s"))
    c2.join(cs, Seq("stratum", "w1"))
      .select(col("stratum"), col("w1"), col("w2"),
        (col("__c").cast("double") / col("__s")).as("p_cond2"))
  }

  /** Per-stratum conditional trigram probabilities
    * (stratum, w1, w2, w3, p_cond3) with p = c(w1,w2,w3) / Σ_w
    * c(w1,w2,w) — the λ₁ channel.
    */
  def trigramCondProbsBy(df: DataFrame, textCol: String,
                         strataCol: String): DataFrame = {
    val c3 = ngramsBy(df, textCol, strataCol, 3)
      .groupBy("stratum", "w1", "w2", "w3").agg(count(lit(1)).as("__c"))
    val cs = c3.groupBy("stratum", "w1", "w2").agg(sum("__c").as("__s"))
    c3.join(cs, Seq("stratum", "w1", "w2"))
      .select(col("stratum"), col("w1"), col("w2"), col("w3"),
        (col("__c").cast("double") / col("__s")).as("p_cond3"))
  }

  /** (stratum, w1..wn) adjacent token n-grams of every document — one
    * map-side transform/sequence projection + posexplode, no shuffle
    * (the [[bigramPairs]] idiom generalized; `extra` columns ride along).
    */
  private def ngramsBy(df: DataFrame, textCol: String, strataCol: String,
                       n: Int, extra: Seq[String] = Nil): DataFrame = {
    val fields = (1 to n)
      .map(i => s"'w$i', __toks[i${if (i == n) "" else s"-${n - i}"}]")
      .mkString(", ")
    df.where(col(s"`$textCol`").isNotNull)
      .select((col(s"`$strataCol`").as("stratum") +:
        extra.map(c => col(s"`$c`"))) :+
        toks(col(s"`$textCol`")).as("__toks"): _*)
      .where(size(col("__toks")) >= n)
      .select(col("*"), explode(expr(
        s"transform(sequence(${n - 1}, size(__toks)-1), " +
          s"i -> named_struct($fields))")).as("__ng"))
      .select(col("*") +: (1 to n).map(i => col(s"__ng.w$i").as(s"w$i")): _*)
      .drop("__toks", "__ng")
  }

  /** Per-document mean TRIGRAM log-probability under two-level
    * interpolation backoff, per stratum — the CCNet-fidelity upgrade of
    * [[scoreDocsBy]] (real CCNet runs a 5-gram KenLM; an interpolated
    * trigram closes most of the distance at one more keyed aggregate):
    * each adjacent triple scores
    * `log10(λ₁·p(w3|w1w2) + λ₂·p(w3|w2) + (1−λ₁−λ₂)·p(w3))`, so an
    * unseen trigram degrades to the bigram channel and an unseen bigram
    * to the unigram channel instead of a hard floor. `pFloor` is the
    * linear unseen-unigram mass (keeps the log argument positive);
    * docs with fewer than three tokens score `logFloor` with their
    * true token count (the budget stages downstream consume n_tokens,
    * so it must be the TOKEN count — n_trigrams + 2 for scoring docs —
    * not the trigram count).
    *
    * Shuffle shape: map-side triple stream, three un-hinted model
    * joins (AQE broadcasts small per-language models, shuffles
    * unbounded ones), one (id, stratum) aggregation — the
    * [[scoreDocsBigram]] scale story with one more join.
    */
  def scoreDocsTrigramBy(df: DataFrame, textCol: String, idCol: String,
                         strataCol: String, trigram: DataFrame,
                         bigram: DataFrame, unigramLin: DataFrame,
                         lambda1: Double, lambda2: Double,
                         pFloor: Double, logFloor: Double): DataFrame = {
    require(lambda1 >= 0 && lambda2 >= 0 && lambda1 + lambda2 < 1,
      "need lambda1, lambda2 >= 0 with lambda1 + lambda2 < 1 (a real " +
        "unigram backoff channel — else an unseen bigram scores log10(0))")
    require(pFloor > 0, "pFloor must be positive (log argument)")
    val lambda3 = 1.0d - lambda1 - lambda2
    val triples = ngramsBy(
      df.where(col(s"`$textCol`").isNotNull)
        .select(col(s"`$idCol`").as("id"), col(s"`$strataCol`"),
          col(s"`$textCol`")),
      textCol, strataCol, 3, extra = Seq("id"))
    val scored = triples
      .join(trigram, Seq("stratum", "w1", "w2", "w3"), "left")
      .join(bigram.select(col("stratum"), col("w1").as("w2"),
        col("w2").as("w3"), col("p_cond2")), Seq("stratum", "w2", "w3"), "left")
      .join(unigramLin.select(col("stratum"), col("token").as("w3"),
        col("p_uni")), Seq("stratum", "w3"), "left")
      .select(col("id"), col("stratum"),
        log10(coalesce(col("p_cond3"), lit(0.0d)) * lambda1 +
          coalesce(col("p_cond2"), lit(0.0d)) * lambda2 +
          coalesce(col("p_uni"), lit(pFloor)) * lambda3).as("__lp"))
      .groupBy("id", "stratum")
      .agg(avg("__lp").as("mean_logp"), count(lit(1)).as("__n3"))
    df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"), col(s"`$strataCol`").as("stratum"),
        size(toks(col(s"`$textCol`"))).cast("long").as("__nt"))
      .join(scored, Seq("id", "stratum"), "left")
      .select(col("id"), col("stratum"),
        coalesce(col("mean_logp"), lit(logFloor)).as("mean_logp"),
        col("__nt").as("n_tokens"))
  }

  def scoreDocs(df: DataFrame, textCol: String, idCol: String,
                unigram: DataFrame, oovLogp: Double): DataFrame = {
    val exploded = df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"), explode(toks(col(s"`$textCol`"))).as("token"))
    val scored = exploded.join(unigram, Seq("token"), "left")
      .groupBy("id")
      .agg(avg(coalesce(col("logp"), lit(oovLogp))).as("mean_logp"),
        count(lit(1)).as("n_tokens"))
    // blank/whitespace docs produced no exploded rows — re-attach at floor
    df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("mean_logp"), lit(oovLogp)).as("mean_logp"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
