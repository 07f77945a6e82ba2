package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.functions.TextFns
import graft.operators.{Decontaminate, Dedup, LmScore, Pii, TextStats}

/** Dev-only: decompose the q82 gate recomposition into timed stages to
  * locate the r9 gate-cost regression (VERDICT r9 What's-wrong #1).
  */
object Q82Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.init(Sessions.builder("local[32]", 32).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q82prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = Tables(spark, sfDir, "documents")
    val bench = docs.where(pmod(col("doc_id"), lit(97)) === 0)
    val ref   = docs.where(pmod(col("doc_id"), lit(10)) === 0)
    val cand  = docs.where(pmod(col("doc_id"), lit(97)) =!= 0 &&
                           pmod(col("doc_id"), lit(10)) =!= 0)
    val cfg = graft.corpus.ReleasePipeline.Config(paragraphDedup = true)
    val res = time("SERVING run()") {
      val r = graft.corpus.ReleasePipeline.run(cand, bench, cfg, Some(ref))
      r.corpus.count(); r
    }
    // ---- gate recomposition, stage by stage (mirrors mkQ82 gated) ----
    def staged(df: org.apache.spark.sql.DataFrame) = df.localCheckpoint(true)
    val input = cand.where(col("text").isNotNull)
    val scrub = time("g0+1 novelty + scrub") {
      val redundant = Decontaminate.noveltyScore(input, "text", "doc_id",
          ref.where(col("text").isNotNull), "text", n = cfg.noveltyN)
        .where(col("novelty") < cfg.noveltyMin).select("id")
      val acq = input.join(redundant, input("doc_id") === redundant("id"),
        "left_anti")
      staged(acq.select(col("doc_id"), Pii.redact(col("text")).as("text")))
    }
    val reExact = time("g2+3 quality + exact") {
      val qual = scrub.join(TextStats.gopherVerdicts(scrub, "text", "doc_id")
        .where(col("pass")).select(col("id").as("doc_id")), "doc_id")
      staged(Dedup.exactByFingerprint(qual, "text", "doc_id"))
    }
    val dd = time("g4 lsh pairs + CC + anti") {
      val docDrop = Dedup.connectedComponents(
          Dedup.minhashLshPairs(reExact, "text", "doc_id",
            shingleN = cfg.shingleN, threshold = cfg.nearDupThreshold,
            precomputedSig = Some(res.minhashSig)))
        .where(col("id") =!= col("label")).select("id")
      staged(reExact.join(docDrop,
        reExact("doc_id") === docDrop("id"), "left_anti"))
    }
    val desp = time("g5 sharedPairs CC + despan") {
      val paraDrop = Dedup.connectedComponents(res.paraPairs.get)
        .where(col("id") =!= col("label")).select("id")
      val pd = dd.join(paraDrop, dd("doc_id") === paraDrop("id"), "left_anti")
      staged(TextStats.removeDupSpans(pd, "text", "doc_id", k = cfg.spanK)
        .where(col("n_kept") > 0)
        .select(col("id").as("doc_id"), col("scrubbed").as("text")))
    }
    val cln = time("g6 decontaminate") {
      staged(Decontaminate.clean(desp, "text", "doc_id",
        bench.where(col("text").isNotNull).select(col("text")), "text",
        n = cfg.decontaminateN))
    }
    val reKept = time("g7 lm floor") {
      val scored = LmScore.scoreDocs(cln, "text", "doc_id",
        LmScore.trainUnigram(cln, "text"), cfg.oovLogp)
      val cut = scored
        .agg(expr(s"approx_percentile(mean_logp, ${cfg.lmFloorQuantile})"))
        .head().getDouble(0)
      cln.join(
        scored.where(col("mean_logp") >= cut).select(col("id").as("doc_id")),
        "doc_id")
    }
    time("g8 parity compare + emit") {
      val out = graft.queries.Gates.setParity(res.corpus, reKept, "doc_id")
        .select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
        .orderBy("doc_id")
      println(s"  rows=${out.count()}")
    }
    spark.stop()
  }
}
