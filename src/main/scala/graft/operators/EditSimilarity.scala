package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable edit-distance similarity join — the string analogue of the
  * engine's Jaccard/Hamming pair family, for the short-string columns a
  * training-data pipeline matches fuzzily (titles, entity names, URLs,
  * filenames).
  *
  * Blocking is the classic segment-partition scheme (the PassJoin
  * pattern, Li/Deng/Feng PVLDB'11, re-derived for Spark): partition
  * every string into `tau + 1` balanced segments (same exact-cover
  * construction as [[Dedup.hammingPairs]] — first `len % (tau+1)`
  * segments one char wider). By pigeonhole, any pair within edit
  * distance `tau` has at least one of the index string's segments
  * appearing UNALIGNED-ERROR-FREE in the probe string, at a start
  * position shifted by at most `tau` (the alignment's net
  * insert/delete drift is bounded by the total error count). So
  * candidates enumerate via an EQUI-join: index rows carry
  * `(len, segIdx, segment)`, probe rows carry every substring that a
  * compatible-length string's segment could be — `(2tau+1)` target
  * lengths × `(tau+1)` segments × `≤(2tau+1)` positions = O(tau³)
  * keys per row, map-side, deduped per row. Every candidate is then
  * verified with one `levenshtein` call. FULL recall at the bound; no
  * quadratic join anywhere.
  *
  * Skew note: a segment shared corpus-wide (constant prefixes in
  * synthetic keys, e.g. "Customer#") concentrates its bucket exactly
  * like a hot LSH band — the same cap/salting guidance applies; on
  * natural-entropy strings segment diversity keeps buckets ~uniform.
  */
object EditSimilarity {

  private def baseOf(df: DataFrame, strCol: String, idCol: String): DataFrame =
    df.where(col(s"`$strCol`").isNotNull)
      .select(col(s"`$idCol`").as("id"), col(s"`$strCol`").as("s"))
      .withColumn("len", length(col("s")))

  private def widthOf(segs: Int)(l: Column, i: Column): Column =
    floor(l / segs).cast("int") + when(i < l % segs, 1).otherwise(0)
  private def startOf(segs: Int)(l: Column, i: Column): Column =
    (i * floor(l / segs).cast("int") + least(i, l % segs)).cast("int")

  /** Index side: each string's `tau + 1` exact segments as
    * `(len, segIdx, segment)` keys.
    */
  private def indexKeys(base: DataFrame, tau: Int): DataFrame = {
    val segs = tau + 1
    val iSeq = sequence(lit(0), lit(tau))
    base.select(col("id").as("id_i"),
        explode(transform(iSeq, i =>
          struct(col("len").as("klen"), i.as("seg"),
            col("s").substr(startOf(segs)(col("len"), i) + 1,
              widthOf(segs)(col("len"), i)).as("kstr")))).as("k"))
      .select(col("id_i"), col("k.klen"), col("k.seg"), col("k.kstr"))
  }

  /** Probe side: every substring a compatible-length index string's
    * segment could be — O(tau³) keys per row, map-side, per-row deduped.
    */
  private def probeKeys(base: DataFrame, tau: Int): DataFrame = {
    val segs = tau + 1
    val iSeq = sequence(lit(0), lit(tau))
    val emptyKeys = array().cast(
      "array<struct<klen:int,seg:int,kstr:string>>")
    base.select(col("id").as("id_p"),
        explode(array_distinct(flatten(flatten(transform(
          sequence(greatest(col("len") - tau, lit(0)).cast("int"),
            (col("len") + tau).cast("int")),
          l => transform(iSeq, i => {
            val w = widthOf(segs)(l, i)
            val st = startOf(segs)(l, i)
            val qlo = greatest(st - tau, lit(0))
            val qhi = least(st + tau, col("len") - w)
            when(qhi >= qlo,
              transform(sequence(qlo, qhi), q =>
                struct(l.cast("int").as("klen"), i.as("seg"),
                  col("s").substr(q + 1, w).as("kstr"))))
              .otherwise(emptyKeys)
          })))))).as("k"))
      .select(col("id_p"), col("k.klen"), col("k.seg"), col("k.kstr"))
  }

  /** All unordered pairs `(id_a, id_b, edit_dist)` with
    * `levenshtein <= tau`, `id_a < id_b`. Null strings are dropped;
    * empty and shorter-than-`tau+1` strings partition into zero-width
    * segments whose empty-key buckets still yield complete candidates
    * (verified exactly like every other pair).
    */
  def editDistanceSelfJoin(df: DataFrame, strCol: String, idCol: String,
                           tau: Int): DataFrame = {
    require(tau >= 1 && tau <= 8, s"tau in [1, 8], got $tau")
    val base = baseOf(df, strCol, idCol)
    val idx = indexKeys(base, tau)
    val probe = probeKeys(base, tau)
    val cand = probe.join(idx,
        probe("klen") === idx("klen") && probe("seg") === idx("seg") &&
          probe("kstr") === idx("kstr") && probe("id_p") =!= idx("id_i"))
      .select(least(col("id_p"), col("id_i")).as("id_a"),
        greatest(col("id_p"), col("id_i")).as("id_b"))
      .distinct()
    val sa = base.select(col("id").as("id_a"), col("s").as("__sa"))
    val sb = base.select(col("id").as("id_b"), col("s").as("__sb"))
    // Thresholded (banded-DP) verify: O(tau * len) per candidate instead
    // of the full O(len^2) matrix — the overload returns -1 above the
    // bound, and the exact distance otherwise.
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("edit_dist",
        levenshtein(col("__sa"), col("__sb"), tau).cast("long"))
      .where(col("edit_dist") >= 0)
      .select("id_a", "id_b", "edit_dist")
  }

  /** DIRECTED cross-corpus variant: all `(id_left, id_right, edit_dist)`
    * with `levenshtein <= tau` between a left (probe) and right (index)
    * frame — the [[Dedup.minhashLshPairsBetween]] shape for edit
    * distance (release-diff triage of short-string fields: titles,
    * names). Same blocking, full recall at the bound; ids are NOT
    * compared across sides (a shared id means the row genuinely appears
    * in both corpora and pairs at distance 0).
    */
  def editDistancePairsBetween(left: DataFrame, right: DataFrame,
                               strCol: String, idCol: String,
                               tau: Int): DataFrame = {
    require(tau >= 1 && tau <= 8, s"tau in [1, 8], got $tau")
    val baseL = baseOf(left, strCol, idCol)
    val baseR = baseOf(right, strCol, idCol)
    val idx = indexKeys(baseR, tau)
    val probe = probeKeys(baseL, tau)
    val cand = probe.join(idx,
        probe("klen") === idx("klen") && probe("seg") === idx("seg") &&
          probe("kstr") === idx("kstr"))
      .select(col("id_p").as("id_left"), col("id_i").as("id_right"))
      .distinct()
    val sl = baseL.select(col("id").as("id_left"), col("s").as("__sl"))
    val sr = baseR.select(col("id").as("id_right"), col("s").as("__sr"))
    cand.join(sl, "id_left").join(sr, "id_right")
      .withColumn("edit_dist",
        levenshtein(col("__sl"), col("__sr"), tau).cast("long"))
      .where(col("edit_dist") >= 0)
      .select("id_left", "id_right", "edit_dist")
  }
}
