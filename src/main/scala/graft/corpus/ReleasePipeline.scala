package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._

/** The full training-data RELEASE workflow as a public API — the
  * composition a user runs before shipping a corpus, each stage one of
  * this library's individually-verified operators:
  *
  *   0. novelty pre-filter   ([[Decontaminate.noveltyScore]] vs an
  *                            existing release — optional, active iff a
  *                            reference corpus is passed: "is this new
  *                            data worth ingesting")
  *   1. PII scrub            ([[Pii.redact]] — map-side projection)
  *   2. quality battery      ([[TextStats.gopherVerdicts]])
  *   3. exact + near dedup   ([[Dedup.exactByFingerprint]] +
  *                            LSH pairs → connected components)
  *   3b. paragraph near-dup  ([[Paragraphs.nearDupDocPairsAuto]] →
  *                            connected components — optional, catches
  *                            boilerplate-sharing docs whole-doc Jaccard
  *                            misses)
  *   4. dup-span removal     ([[TextStats.removeDupSpans]] — Lee et al.
  *                            removal; fully-covered docs drop out)
  *   5. decontamination      ([[Decontaminate.clean]] vs a benchmark set)
  *   6. LM-score floor       ([[LmScore]] unigram mean-logprob quantile)
  *   7. sequence packing     ([[Packing.packChunks]] — span assignment)
  *
  * Every stage is a scan or a keyed shuffle (see SCALE.md per family);
  * the composition adds no operator of its own, so the 100 TB story is
  * the stages'. `ReleasePipelineSpec` pins the stage contracts compose
  * (counts monotone, packed spans tile the surviving stream exactly).
  */
object ReleasePipeline {

  final case class Config(
      textCol: String = "text",
      idCol: String = "doc_id",
      nearDupThreshold: Double = 0.9,
      shingleN: Int = 3,
      spanK: Int = 5,
      decontaminateN: Int = 3,
      lmFloorQuantile: Double = 0.1,
      oovLogp: Double = -12.0,
      packCapacity: Long = 512L,
      // stage 0 — used iff `noveltyRef` is passed to run(): keep docs with
      // novelty >= noveltyMin vs the reference; gram-less docs (nothing to
      // judge) pass through. The reference is an already-released CORPUS,
      // not an eval suite, so its gram set is NOT broadcast by default —
      // a caller with a known-small reference can opt in.
      noveltyN: Int = 3,
      noveltyMin: Double = 0.3,
      noveltyBroadcastRef: Boolean = false,
      // stage 3b — off by default (doc-level dedup already ran).
      paragraphDedup: Boolean = false,
      paragraphWindow: Int = 16,
      paragraphThreshold: Double = 0.5)

  /** Stage survivor counts. Optional stages that are off repeat their
    * predecessor's count (the stage passed everything through).
    */
  final case class Stats(
      input: Long,
      afterNovelty: Long,
      afterQuality: Long,
      afterDedup: Long,
      afterParaDedup: Long,
      afterDespan: Long,
      afterDecontaminate: Long,
      afterLmFloor: Long)

  /** `corpus`: the surviving (id, text) stream (text fully scrubbed);
    * `packed`: its packing assignment at `packCapacity`; `minhashSig`:
    * the (id, sig) MinHash signature frame stage 3 computed over the
    * exact-dedup survivors (lazily persisted — release tooling reuses it
    * to diff future candidate batches against this release, and parity
    * harnesses reuse it instead of re-running the sketch kernel; callers
    * that consume it should unpersist when done).
    */
  final case class Result(corpus: DataFrame, packed: DataFrame, stats: Stats,
      minhashSig: DataFrame)

  /** Run the release workflow. `benchmark` is the evaluation set to
    * decontaminate against (its text column is `cfg.textCol`);
    * `noveltyRef` is the already-released corpus to score acquisition
    * novelty against (same text column) — omitted, stage 0 is skipped.
    * `checkpointDir` makes the build RESTARTABLE: each stage boundary
    * persists to `<dir>/<stage>` parquet and a re-run resumes from the
    * last completed stage (read-or-compute — the reference's S5/S6
    * checkpoint idiom applied to the whole workflow). At 100 TB a
    * multi-hour release build dying at stage 6 restarts in minutes.
    */
  def run(docs: DataFrame, benchmark: DataFrame,
          cfg: Config = Config(),
          noveltyRef: Option[DataFrame] = None,
          checkpointDir: Option[String] = None): Result = {
    val id = col(s"`${cfg.idCol}`")
    val input = docs.where(col(s"`${cfg.textCol}`").isNotNull)

    // Stage dirs are keyed by NAME only, so a resumed run must prove it
    // is the SAME build: a `_manifest.json` (config + input/benchmark/
    // reference fingerprints) is written before any stage and checked on
    // every subsequent run against the dir. A mismatch means the caller
    // changed semantics under an old checkpoint — resuming would splice
    // old-config stage outputs into a new-config build with no error
    // (silent wrong output), so we fail loudly instead.
    checkpointDir.foreach { d =>
      checkOrWriteManifest(docs.sparkSession, d,
        manifest(cfg, input, benchmark, noveltyRef))
    }

    // 0. Acquisition novelty floor — drop docs the existing release
    // already covers. Anti-join on the DROP set so gram-less docs (no
    // novelty row) pass through instead of silently vanishing.
    val acquired = noveltyRef match {
      case None => input
      case Some(ref) =>
        val redundant = Decontaminate.noveltyScore(
            input, cfg.textCol, cfg.idCol,
            ref.where(col(s"`${cfg.textCol}`").isNotNull), cfg.textCol,
            n = cfg.noveltyN,
            broadcastReference = cfg.noveltyBroadcastRef)
          .where(col("novelty") < cfg.noveltyMin).select("id")
        input.join(redundant, id === redundant("id"), "left_anti")
    }

    // Each stage boundary below is an EAGER localCheckpoint, for two
    // compounding reasons. (1) Reuse: later stages, the eager edge
    // collects, and the stage-count stats each consume the frame again —
    // without materialization every consumer re-runs the whole upstream
    // cascade (LSH + span index + paragraph routing several times over).
    // (2) Lineage truncation: a persist alone leaves each stage's plan
    // EMBEDDED in the next one's, and stages that reference their input
    // twice (every join-with-derived-drop-set here) DOUBLE the plan tree
    // per stage — by stage 7 the driver spends minutes stringifying
    // exponential plan trees for listener events, dwarfing execution.
    // localCheckpoint cuts the subtree to a leaf: plans stay O(stage),
    // which is also what keeps Catalyst/AQE planning time bounded on a
    // real cluster. Blocks free when the frames are GC'd.
    //
    // With `checkpointDir` the boundary is DURABLE parquet instead
    // (read-or-compute): same reuse and lineage truncation, plus a
    // crashed run resumes from its last completed stage. The stage body
    // is by-name so a resumed stage skips its eager work (the CC edge
    // collects, the LM cut) entirely.
    def staged(name: String, df: => DataFrame): DataFrame =
      checkpointDir match {
        case Some(d) =>
          graft.sources.Checkpoint.readOrCompute(docs.sparkSession, s"$d/$name")(df)
        case None => df.localCheckpoint(true)
      }

    // 1. PII scrub — pure projection, row count unchanged.
    val scrubbed = staged("1_scrub", acquired.select(id.as("doc_id"),
      Pii.redact(col(s"`${cfg.textCol}`")).as("text")))

    // 2. Gopher-style quality battery.
    val qualified = staged("2_quality", scrubbed.join(
      TextStats.gopherVerdicts(scrubbed, "text", "doc_id")
        .where(col("pass")).select(col("id").as("doc_id")), "doc_id"))

    // 3. Exact dedup, then LSH near-dup clusters (keep cluster-min id).
    val exact = staged("3_exact", Dedup.exactByFingerprint(qualified, "text", "doc_id"))
    // Signatures as a shared lazily-persisted frame: the drop-set below
    // consumes them, and Result exposes them for reuse (cross-corpus
    // release diffs, parity harnesses) without a second sketch-kernel
    // pass. Lazy persist costs nothing if the build crashes before the
    // dedup stage and nothing extra when nobody reuses it.
    val sig = Dedup.minhashSignaturesGen(exact, "doc_id", "text",
        cfg.shingleN, numHashes = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deduped = staged("3_dedup", {
      val drops = Dedup.connectedComponents(
          Dedup.minhashLshPairs(exact, "text", "doc_id",
            shingleN = cfg.shingleN, threshold = cfg.nearDupThreshold,
            precomputedSig = Some(sig)))
        .where(col("id") =!= col("label")).select("id")
      exact.join(drops, exact("doc_id") === drops("id"), "left_anti")
    })

    // 3b. Paragraph-granular near-dup — boilerplate-sharing docs that
    // whole-doc Jaccard misses; greedy keep-cluster-min, same convention
    // as stage 3.
    val paraDeduped =
      if (!cfg.paragraphDedup) deduped
      else staged("3b_paradedup", {
        val paras = Paragraphs.splitTokenWindows(deduped, "text", "doc_id",
          cfg.paragraphWindow)
        val pDrops = Dedup.connectedComponents(
            Paragraphs.nearDupDocPairsAuto(paras, cfg.shingleN,
                cfg.paragraphThreshold,
                knownMaxShingles = Some(cfg.paragraphWindow - cfg.shingleN + 1))
              .select(col("doc_a").as("id_a"), col("doc_b").as("id_b")))
          .where(col("id") =!= col("label")).select("id")
        deduped.join(pDrops, deduped("doc_id") === pDrops("id"), "left_anti")
      })

    // 4. Exact-substring scrub: REMOVE corpus-duplicated spans and drop
    // docs scrubbed to nothing (the paper's degenerate case).
    val despanned = staged("4_despan", TextStats.removeDupSpans(
        paraDeduped, "text", "doc_id", k = cfg.spanK)
      .where(col("n_kept") > 0)
      .select(col("id").as("doc_id"), col("scrubbed").as("text")))

    // 5. Decontaminate against the benchmark.
    val clean = staged("5_decontaminate", Decontaminate.clean(
      despanned, "text", "doc_id",
      benchmark.where(col(s"`${cfg.textCol}`").isNotNull)
        .select(col(s"`${cfg.textCol}`").as("text")), "text",
      n = cfg.decontaminateN))

    // 6. Unigram-LM floor: drop the lowest-scoring quantile.
    val kept = staged("6_lmfloor", {
      val uni = LmScore.trainUnigram(clean, "text")
      val scored = LmScore.scoreDocs(clean, "text", "doc_id", uni, cfg.oovLogp)
      val cut = scored
        .agg(expr(s"approx_percentile(mean_logp, ${cfg.lmFloorQuantile})"))
        .head().getDouble(0)
      clean.join(
        scored.where(col("mean_logp") >= cut).select(col("id").as("doc_id")),
        "doc_id")
    })

    // 7. Packing assignment over the survivors.
    val sized = kept.select(col("doc_id"),
      graft.functions.TextFns.tokenCount(col("text")).cast("long").as("len"))
    val packed = Packing.packChunks(sized, "doc_id", "len", cfg.packCapacity)

    val inputN = input.count()
    val dedupedN = deduped.count()
    val stats = Stats(
      input = inputN,
      // PII scrub is 1:1, so the scrubbed checkpoint carries stage 0's
      // count — recounting `acquired` would re-run the novelty probe.
      afterNovelty = if (noveltyRef.isEmpty) inputN else scrubbed.count(),
      afterQuality = qualified.count(),
      afterDedup = dedupedN,
      afterParaDedup = if (!cfg.paragraphDedup) dedupedN
                       else paraDeduped.count(),
      afterDespan = despanned.count(),
      afterDecontaminate = clean.count(),
      afterLmFloor = kept.count())
    Result(kept, packed, stats, sig)
  }

  /** Build fingerprint: the full `Config` (a case class, so `toString`
    * is a stable total rendering of every field) plus a count + xor'd
    * xxhash64 per input frame. The doc fingerprint hashes the ID column
    * only — a column-pruned scan, cheap even at 100 TB where hashing
    * the text itself would re-read the whole corpus just to resume; the
    * manifest therefore catches added/removed/re-keyed docs but not an
    * in-place text edit under an unchanged id (callers rewriting text
    * in place must clear the checkpoint dir). The benchmark and novelty
    * reference hash their text: both are small by construction (an eval
    * suite; a released corpus sampled for novelty) and their content IS
    * the semantics.
    */
  private[graft] def manifest(cfg: Config, input: DataFrame,
      benchmark: DataFrame, noveltyRef: Option[DataFrame]): String = {
    def fp(df: DataFrame, c: String): String = {
      val r = df.agg(count(lit(1)), coalesce(expr(s"bit_xor(xxhash64(`$c`))"), lit(0L))).head()
      s"${r.getLong(0)}:${r.getLong(1)}"
    }
    val b = benchmark.where(col(s"`${cfg.textCol}`").isNotNull)
    val n = noveltyRef
      .map(r => fp(r.where(col(s"`${cfg.textCol}`").isNotNull), cfg.textCol))
      .getOrElse("none")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    // One key per line: the mismatch error is diffable by eye.
    s"""{"config": "${esc(cfg.toString)}",
       | "input": "${fp(input, cfg.idCol)}",
       | "benchmark": "${fp(b, cfg.textCol)}",
       | "noveltyRef": "$n"}""".stripMargin
  }

  /** First run against `dir` records the manifest (temp-file + rename so
    * a crash mid-write leaves no half manifest); later runs must match
    * it exactly or the build refuses to resume.
    */
  private def checkOrWriteManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String, expected: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val path = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    if (fs.exists(path)) {
      val in = fs.open(path)
      val found = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                  finally in.close()
      if (found != expected) throw new IllegalStateException(
        s"Release checkpoint dir $dir was built by a DIFFERENT run — " +
        "resuming would mix stage outputs across configs/inputs. " +
        s"Clear the dir or use a fresh one.\n--- recorded ---\n$found\n" +
        s"--- this run ---\n$expected")
    } else {
      val tmp = new org.apache.hadoop.fs.Path(dir, "_manifest.json.tmp")
      val out = fs.create(tmp, true)
      try out.write(expected.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, path) && !fs.exists(path))
        throw new java.io.IOException(s"could not commit manifest at $path")
    }
  }
}
