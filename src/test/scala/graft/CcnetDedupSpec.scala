package graft

import org.apache.spark.sql.functions._

import graft.operators.{LmScore, Paragraphs, Sampling}

/** CCNet's paragraph-hash dedup stage ([[Paragraphs.dedupFirstByShard]],
  * the q163 operator): keep-first winner semantics per (shard,
  * fingerprint), document re-assembly, vanishing all-copy documents —
  * and the stage's REASON TO EXIST: a boilerplate paragraph shared
  * across pages distorts the downstream LM tier boundaries until dedup
  * removes it.
  */
class CcnetDedupSpec extends SparkSuite {
  import spark.implicits._

  test("keep-first per (shard, fingerprint): min (doc, position) wins, per shard") {
    val docs = Seq(
      (1L, "en", "unique one\n\nshared footer here"),
      (2L, "en", "shared footer here\n\nunique two"),
      (3L, "en", "shared footer here"), // all-copy doc: disappears
      (4L, "fr", "shared footer here\n\nunique quatre")) // other shard keeps its own copy
      .toDF("doc_id", "lang", "text")
    val out = Paragraphs.dedupFirstByShard(docs, "text", "doc_id", "lang")
    assert(out.columns.toSeq === Seq("doc_id", "lang", "text"))
    val byId = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(1L) === "unique one\n\nshared footer here")
    assert(byId(2L) === "unique two")
    assert(!byId.contains(3L))
    // the fr shard never saw en's copy — its own first occurrence survives
    assert(byId(4L) === "shared footer here\n\nunique quatre")
  }

  test("fingerprint granularity: near-identical paragraphs dedup via q31 normalization; intra-doc repeats collapse") {
    val docs = Seq(
      (1L, "en", "The footer, here!\n\nbody one"),
      (2L, "en", "the footer here\n\nbody two"), // same normalized fingerprint
      (3L, "en", "twice twice\n\ntwice twice")) // intra-doc duplicate
      .toDF("doc_id", "lang", "text")
    val byId = Paragraphs.dedupFirstByShard(docs, "text", "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(1L) === "The footer, here!\n\nbody one")
    assert(byId(2L) === "body two")
    assert(byId(3L) === "twice twice") // one copy kept, in position order
  }

  test("column order and extra columns ride through unchanged") {
    val docs = Seq((7L, "en", 0.5, "a b\n\nc d"))
      .toDF("doc_id", "lang", "lang_conf", "text")
    val out = Paragraphs.dedupFirstByShard(docs, "text", "doc_id", "lang")
    assert(out.columns.toSeq === Seq("doc_id", "lang", "lang_conf", "text"))
    assert(out.as[(Long, String, Double, String)].collect()
      === Array((7L, "en", 0.5, "a b\n\nc d")))
  }

  test("a duplicated paragraph no longer distorts tier boundaries") {
    // Unique bodies with a deliberate score spread; the shared footer's
    // tokens flood the unigram LM when left duplicated, compressing every
    // doc's mean toward the footer mass and flipping tier boundaries.
    val footer = "subscribe to the newsletter and follow the site for more " +
      "updates every single day of the year"
    val bodies = Seq(
      1L -> "alpha alpha alpha alpha alpha alpha",
      2L -> "alpha alpha alpha beta",
      3L -> "beta beta gamma gamma",
      4L -> "gamma delta epsilon zeta",
      5L -> "eta theta iota kappa lambda mu",
      6L -> "nu xi omicron pi rho sigma tau upsilon")
    val withDup = bodies.map { case (id, b) => (id, "en", s"$b\n\n$footer") }
      .toDF("doc_id", "lang", "text")
    // the clean reference: the footer exists ONCE in the corpus (doc 1)
    val clean = bodies.map { case (id, b) =>
        (id, "en", if (id == 1L) s"$b\n\n$footer" else b)
      }.toDF("doc_id", "lang", "text")

    def tiers(docs: org.apache.spark.sql.DataFrame): Map[Long, String] = {
      val uni = LmScore.trainUnigramBy(docs, "text", "lang")
      val scored = LmScore.scoreDocsBy(docs, "text", "doc_id", "lang", uni, -12.0)
        .select(col("id").as("doc_id"), col("stratum").as("lang"),
          round(col("mean_logp"), 6).as("mean_logp"), col("n_tokens"))
      Sampling.percentileBuckets(scored, "lang", "doc_id", "mean_logp",
          Seq("head" -> 0.25, "middle" -> 0.5, "tail" -> 0.25))
        .select("doc_id", "tier").as[(Long, String)].collect().toMap
    }

    val deduped = Paragraphs.dedupFirstByShard(withDup, "text", "doc_id", "lang")
    // dedup recovers the clean corpus exactly...
    assert(deduped.as[(Long, String, String)].collect().sortBy(_._1)
      === clean.as[(Long, String, String)].collect().sortBy(_._1))
    // ...so its tiers equal the clean tiers,
    assert(tiers(deduped) === tiers(clean))
    // while the duplicated footer had DISTORTED at least one boundary
    assert(tiers(withDup) !== tiers(clean))
  }
}
