package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-plan correctness gates for queries whose semantics a SQL oracle
  * cannot mirror — approximate ANN retrieval (hash/quantizer internals
  * differ from anything DuckDB can compute) and incremental composites.
  *
  * The gate compares the approximate result against an exact baseline
  * computed IN THE SAME PLAN and emits ZERO ROWS when the check fails, so
  * the driver's rows-only check (">0 rows at sf0.01") becomes a real
  * recall/parity gate instead of a vacuous count: a recall regression now
  * FAILS CORRECTNESS_r{N} rather than passing silently (VERDICT r2 next-4).
  * Floors per query are documented in COVERAGE.md.
  */
object Gates {

  /** Emit `approx` (plus a `recall_hits` column) iff at least `minHits` of
    * its `idCol` values appear in `exact` — a recall@k floor. One small
    * semi-join + broadcast of a 1-row count; the gate adds no shuffle of
    * the result itself.
    *
    * Floors are calibrated to the OBSERVED deterministic recall on the
    * synthetic corpus, which has near-uniform probe similarity (no planted
    * query neighbors) — ANN's worst case, where high recall would require
    * scanning most of the corpus. The gate therefore catches machinery
    * regressions (wrong buckets, broken quantizer: hits collapse toward
    * the random-overlap baseline k²/N), not statistical tuning.
    */
  def recallFloor(approx: DataFrame, exact: DataFrame, idCol: String,
                  minHits: Int): DataFrame = {
    val hits = approx
      .join(exact.select(col(s"`$idCol`")), Seq(idCol), "left_semi")
      .agg(count(lit(1)).as("recall_hits"))
    approx.crossJoin(broadcast(hits))
      .where(col("recall_hits") >= minHits)
  }

  /** Emit `emit` unchanged iff `probe` recalls at least `minHits` of
    * `want` — the stripe-gated variant of [[recallFloor]]: the recall
    * check runs over a cheap sampled slice while the emitted result stays
    * the full computation (`recall_hits` column attached).
    */
  def recallFloorOn(emit: DataFrame, probe: DataFrame, want: DataFrame,
                    idCol: String, minHits: Int): DataFrame = {
    val hits = probe
      .join(want.select(col(s"`$idCol`")), Seq(idCol), "left_semi")
      .agg(count(lit(1)).as("recall_hits"))
    emit.crossJoin(broadcast(hits))
      .where(col("recall_hits") >= minHits)
  }

  /** Emit `df` unchanged iff an aggregate statistic over it clears
    * `floor` — e.g. the MEAN exact cosine of SimHash-surfaced pairs must
    * sit well above the corpus's random-pair baseline (per-row floors
    * don't discriminate when the estimator's tail overlaps the baseline;
    * the aggregate collapses to the baseline the moment bucketing
    * breaks). An empty `df` emits empty (failing the rows-check) — no
    * pairs is itself a regression.
    */
  def aggFloor(df: DataFrame, stat: org.apache.spark.sql.Column, floor: Double): DataFrame = {
    val s = df.agg(stat.cast("double").as("__stat"))
    df.crossJoin(broadcast(s))
      .where(col("__stat") >= floor).drop("__stat")
  }

  /** Emit `emit` unchanged iff `got`'s `idCol` multiset EQUALS `want`'s
    * — the [[setParity]] check applied to a surface other than the
    * emitted result (e.g. q87 emits the incremental release's final
    * survivors but gates on dedup-boundary parity, the surface where
    * chained == one-shot is an exact contract).
    */
  def setParityOn(emit: DataFrame, got: DataFrame, want: DataFrame,
                  idCol: String): DataFrame = {
    val g = got.select(col(s"`$idCol`"))
    val w = want.select(col(s"`$idCol`"))
    val diff = g.exceptAll(w).union(w.exceptAll(g))
      .agg(count(lit(1)).as("__mismatches"))
    emit.crossJoin(broadcast(diff))
      .where(col("__mismatches") === 0).drop("__mismatches")
  }

  /** Emit `got` unchanged iff its `idCol` multiset EQUALS `want`'s —
    * an exact-parity gate (e.g. incremental result == batch result).
    */
  def setParity(got: DataFrame, want: DataFrame, idCol: String): DataFrame = {
    val g = got.select(col(s"`$idCol`"))
    val w = want.select(col(s"`$idCol`"))
    val diff = g.exceptAll(w).union(w.exceptAll(g))
      .agg(count(lit(1)).as("__mismatches"))
    got.crossJoin(broadcast(diff))
      .where(col("__mismatches") === 0).drop("__mismatches")
  }
}
