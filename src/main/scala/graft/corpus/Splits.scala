package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Sampling

/** Leakage-safe train/validation/test split assignment.
  *
  * Splitting a corpus row-by-row leaks: two copies of the same document
  * (exact dups survive many pipelines; near-dups survive most) land in
  * different splits and the eval set scores memorization. The fix is to
  * key the split decision on a GROUP of equivalent documents, not the
  * row: every member of a dup group hashes to the same split by
  * construction.
  *
  * The decision is `md5(groupKey)` against cumulative hex thresholds
  * ([[Sampling.hexThreshold]]), so it is — like all sampling in this
  * engine — a pure function of the data: reproducible across runs,
  * partitionings, and engines (the DuckDB oracle mirrors it verbatim),
  * and append-stable (a new document never flips an existing one's
  * split — exactly what an incrementally-growing corpus needs).
  *
  * Scale shape: [[byGroupKey]] is a single map-side CASE over a hash —
  * ZERO shuffle, no group materialization, no driver state. The
  * exact-dup grouping ([[exactDupSafe]]) needs no shuffle either: the
  * group key IS the content fingerprint, computed per row. Near-dup
  * grouping composes: feed `Dedup.connectedComponents` representatives
  * in as the group key (see SplitsSpec) — one component join, then the
  * same map-side assignment.
  */
object Splits {

  /** The split-assignment expression: cumulative hash thresholds over
    * `md5(groupKey)`. `fractions` is ordered; the LAST split absorbs the
    * remainder to 1.0 (so fractions need not sum to exactly 1 and FP
    * rounding can never leave a row unassigned).
    */
  def splitExpr(groupKey: Column, fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "at least one split required")
    require(fractions.forall(_._2 > 0.0), "split fractions must be > 0")
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    require(cum.last <= 1.0 + 1e-9, s"split fractions sum to ${cum.last} > 1")
    val h = md5(groupKey.cast("string"))
    val assigned = fractions.init.zip(cum.init)
      .foldLeft(when(lit(false), lit(""))) {
        case (acc, ((name, _), c)) =>
          acc.when(h < lit(Sampling.hexThreshold(c)), lit(name))
      }.otherwise(lit(fractions.last._1))
    // NULL keys would all fall through to the last split — fail loudly
    // in-plan instead (keeps the operator lazy and map-side).
    when(groupKey.isNull,
      raise_error(lit("Splits: NULL group key — coalesce optional group " +
        "keys to a row id before assigning splits")).cast("string"))
      .otherwise(assigned)
  }

  /** Assign every row a split keyed on `groupKeyCol`: rows sharing a
    * group key always share a split. Map-side, zero shuffle.
    *
    * A NULL group key hashes to NULL and would silently co-assign every
    * null-keyed row to the last split — the expression raises instead
    * (in-plan, so the operator stays lazy and shuffle-free; callers
    * with optional grouping coalesce to the row id first, as the
    * near-dup composition in SplitsVocabSpec does).
    */
  def byGroupKey(df: DataFrame, groupKeyCol: String,
                 fractions: Seq[(String, Double)],
                 splitCol: String = "split"): DataFrame = {
    require(!df.columns.contains(splitCol),
      s"split column '$splitCol' collides with an input column")
    df.withColumn(splitCol, splitExpr(col(s"`$groupKeyCol`"), fractions))
  }

  /** Exact-dup-safe splits: the group key is the content fingerprint
    * (md5 of normalized text — the q31 dedup-key convention, including
    * its singleton `__empty__:<id>` fallback for blank documents, so an
    * all-blank shard cannot collapse into one group). Every
    * byte-equivalent (post-normalization) copy of a document lands in
    * the same split regardless of where or how often it appears.
    * Still zero shuffle: fingerprint + assignment are both map-side.
    */
  def exactDupSafe(df: DataFrame, textCol: String, idCol: String,
                   fractions: Seq[(String, Double)],
                   splitCol: String = "split"): DataFrame = {
    require(!df.columns.contains(splitCol),
      s"split column '$splitCol' collides with an input column")
    // NULL text gets the same singleton fallback as blank text (a null
    // document is nobody's duplicate) rather than tripping the NULL-key
    // guard in splitExpr.
    val key = when(col(s"`$textCol`").isNull ||
        length(trim(col(s"`$textCol`"))) === 0,
        concat(lit("__empty__:"), col(s"`$idCol`").cast("string")))
      .otherwise(TextFns.fingerprint(col(s"`$textCol`")))
    df.withColumn(splitCol, splitExpr(key, fractions))
  }

  /** NEAR-dup-safe splits — the leakage-proof assignment: rows sharing a
    * near-dup CLUSTER share a split, so a test document can never have a
    * near-duplicate sibling in train (the q98 leakage audit's failure
    * mode, prevented by construction). `pairs` is similarity evidence
    * (id_a, id_b) from any of the engine's pair kernels (MinHash-LSH,
    * n-gram Jaccard, SimHash, embedding cosine…); connected components
    * label the clusters, the cluster label keys the split, and
    * singletons key on their own id.
    *
    * Shape: the expensive part is the caller's pair kernel; components
    * run over PAIR-cardinality evidence ([[graft.operators.Dedup
    * .connectedComponents]]'s hybrid route), the label frame is
    * pair-bounded (AQE-broadcast in the common case), and the
    * assignment itself stays the map-side hash expression.
    */
  def nearDupSafe(df: DataFrame, idCol: String, pairs: DataFrame,
                  fractions: Seq[(String, Double)],
                  splitCol: String = "split"): DataFrame = {
    require(!df.columns.contains(splitCol),
      s"split column '$splitCol' collides with an input column")
    val labels = graft.operators.Dedup.connectedComponents(pairs)
      .select(col("id").as("__nd_id"), col("label").as("__nd_label"))
    df.join(labels, col(s"`$idCol`") === col("__nd_id"), "left")
      .withColumn(splitCol, splitExpr(
        coalesce(col("__nd_label"), col(s"`$idCol`").cast("long")), fractions))
      .drop("__nd_id", "__nd_label")
  }
}
