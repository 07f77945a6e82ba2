package graft

import org.apache.spark.sql.functions._

import graft.operators.{LangId, LmScore, Sampling}

/** The q158 CCNet composition's building blocks: per-stratum LM
  * training/scoring ([[LmScore.trainUnigramBy]]/[[LmScore.scoreDocsBy]]),
  * a language ABSENT from the corpus (empty stratum — no crash, no
  * spurious rows), "und" exclusion, and budget behavior on a stratum
  * smaller than its budget.
  */
class CcnetCompositionSpec extends SparkSuite {
  import spark.implicits._

  test("trainUnigramBy: per-stratum tables normalize over their own mass") {
    val docs = Seq(
      ("en", "the cat the dog"),
      ("en", "the bird"),
      ("fr", "le chat")).toDF("lang", "text")
    val uni = LmScore.trainUnigramBy(docs, "text", "lang")
      .as[(String, String, Double)].collect()
      .map { case (s, t, lp) => ((s, t), lp) }.toMap
    // en mass = 6 tokens: the×3, cat, dog, bird; fr mass = 2: le, chat
    assert(math.abs(uni(("en", "the")) - math.log10(3.0 / 6)) < 1e-12)
    assert(math.abs(uni(("en", "cat")) - math.log10(1.0 / 6)) < 1e-12)
    assert(math.abs(uni(("fr", "le")) - math.log10(1.0 / 2)) < 1e-12)
    // no cross-stratum leakage: "the" exists only under en
    assert(!uni.contains(("fr", "the")))
  }

  test("scoreDocsBy: each doc scores under its own stratum; cross-stratum tokens are OOV") {
    val docs = Seq(
      (1L, "en", "the cat"),
      (2L, "fr", "le chat"),
      (3L, "fr", "the cat")). // English words under fr → all OOV
      toDF("id", "lang", "text")
    val uni = LmScore.trainUnigramBy(
      Seq(("en", "the cat the dog"), ("fr", "le chat")).toDF("lang", "text"),
      "text", "lang")
    val got = LmScore.scoreDocsBy(docs, "text", "id", "lang", uni, -9.0)
      .as[(Long, String, Double, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(math.abs(got(1L)._1 -
      (math.log10(2.0 / 4) + math.log10(1.0 / 4)) / 2) < 1e-12)
    assert(math.abs(got(2L)._1 - math.log10(1.0 / 2)) < 1e-12)
    assert(got(3L) === (-9.0, 2L)) // fr model never saw "the"/"cat"
  }

  test("language absent from the corpus: empty stratum flows through all four stages") {
    // en/de sentences only — zh/ar/etc are in the MODEL but not in this
    // corpus; the composition must neither crash nor emit rows for them
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog while the children watch"),
      (2L, "the students read their books in the library every afternoon today"),
      (3L, "good friends help each other through the hard times and share"),
      (4L, "die kinder lesen ihre bücher in der alten bibliothek am fluss"),
      (5L, "gute freunde helfen einander durch schwere zeiten im ganzen land"),
      (6L, "der zug verlässt den bahnhof am morgen und erreicht die stadt"),
      (7L, "xq zvw"), // short gibberish → und
      (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val classified = LangId.classify(
        docs.where(col("text").isNotNull), "text")
      .where(col("lang") =!= "und")
    val langs = classified.select("lang").distinct()
      .as[String].collect().toSet
    assert(langs === Set("en", "de"), langs.toString)
    val uni = LmScore.trainUnigramBy(classified, "text", "lang")
    // the per-language tables exist ONLY for present languages
    assert(uni.select("stratum").distinct().as[String].collect().toSet
      === Set("en", "de"))
    val scored = LmScore
      .scoreDocsBy(classified, "text", "doc_id", "lang", uni, -12.0)
      .select(col("id").as("doc_id"), col("stratum").as("lang"),
        round(col("mean_logp"), 6).as("mean_logp"), col("n_tokens"))
    val tiered = Sampling.percentileBuckets(scored, "lang", "doc_id",
      "mean_logp", Seq("head" -> 0.25, "middle" -> 0.5, "tail" -> 0.25))
    val out = Sampling.byTokenBudget(tiered.where(col("tier") =!= "tail"),
      "lang", "doc_id", "n_tokens",
      Map("zh" -> 250L), defaultBudget = 10000L) // zh budget: dead config
      .select("doc_id", "lang", "tier").as[(Long, String, String)]
      .collect()
    // nothing appears for zh (or any absent language); und/null rows
    // never reach the tiers; a budget larger than a stratum keeps all
    // its head+middle docs
    assert(out.map(_._2).toSet === Set("en", "de"))
    val keptEn = out.filter(_._2 == "en").map(_._1).toSet
    val headMidEn = tiered
      .where(col("lang") === "en" && col("tier") =!= "tail")
      .select("doc_id").as[Long].collect().toSet
    assert(keptEn === headMidEn)
    assert(!out.map(_._1).contains(7L) && !out.map(_._1).contains(8L))
  }
}
