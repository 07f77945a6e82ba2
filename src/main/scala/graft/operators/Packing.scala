package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk pass that turns a document
  * corpus into fixed-length training examples (the GPT-style data layout:
  * concatenate all documents in a deterministic order, slice the token
  * stream into `capacity`-token chunks). The per-document answer is its
  * span [start_token, end_token) in the concatenated stream and the chunk
  * its first token lands in.
  *
  * The core is a DISTRIBUTED PREFIX SUM. The naive formulation — a global
  * window `sum(len) over (order by id)` — plans as a single-partition
  * window: one executor sorts the corpus. Here:
  *
  *   1. bucket boundaries come from `approxQuantile` over the order key —
  *      a deterministic sketch (no RNG), so each row's bucket is a PURE
  *      FUNCTION OF ITS KEY, independent of physical placement,
  *   2. per-bucket subtotals collect to the driver — #buckets longs,
  *      metadata at any scale — and prefix into per-bucket offsets,
  *   3. the within-bucket running sum is a window PARTITIONED by the
  *      bucket (bounded work per bucket), plus the broadcast offset.
  *
  * Because the bucket never depends on `spark_partition_id`, the result
  * is stable under recomputation: the frame can be consumed by any number
  * of actions, cache-evicted, or re-planned without the offsets drifting
  * (the earlier range-partition formulation pinned placement with a
  * persist whose release contract was single-consuming-action — fragile
  * for library users). Identical arithmetic to the global window (spec +
  * oracle-checked); shuffle cost of one hash exchange on the bucket.
  */
object Packing {

  /** Adds `start_token` (tokens strictly before this row in id order).
    * `idCol` must be numeric (the bucket boundaries are quantiles) and
    * unique per row (it is the total order of the concatenated stream).
    */
  def withPrefixSum(df: DataFrame, idCol: String, lenCol: String): DataFrame = {
    val spark = df.sparkSession
    val nBuckets = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt.max(1)
    // Deterministic, data-derived split points (Greenwald-Khanna sketch —
    // same input, same splits, every execution).
    val splits = df.stat
      .approxQuantile(idCol, (1 until nBuckets).map(_.toDouble / nBuckets).toArray, 0.001)
      .distinct.sorted
    val bucket = splits
      .foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(s"`$idCol`").cast("double") > lit(b), 1).otherwise(0)
      }
    val parts = df.withColumn("__b", bucket)
    // Per-bucket subtotals: #buckets longs — driver-side metadata at any
    // scale. Safe to compute in a separate action because the bucket
    // assignment above is deterministic: any later recomputation of
    // `parts` reproduces the same buckets, so the offsets stay valid for
    // the frame's whole lifetime (no persist / release contract needed).
    val totals = parts.groupBy("__b")
      .agg(sum(col(s"`$lenCol`")).as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1).zip(
      totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__b", "__offset")
    val w = Window.partitionBy("__b").orderBy(col(s"`$idCol`"))
      .rowsBetween(Window.unboundedPreceding, -1)
    parts
      .join(broadcast(offDf), Seq("__b"))
      .withColumn("start_token",
        col("__offset") + coalesce(sum(col(s"`$lenCol`")).over(w), lit(0L)))
      .drop("__b", "__offset")
  }

  /** MATERIALIZE the packed chunks — the step that turns the span
    * assignment ([[packChunks]]) into actual fixed-length training
    * examples: every token maps to its global stream position
    * (start_token + offset, via the same distributed prefix sum), tokens
    * group by `gpos div capacity`, and each chunk reassembles its slice
    * of the stream in order. Documents straddle chunk boundaries exactly
    * as the assignment says (concat-and-chunk semantics).
    *
    * Shape: one linear token explode (unavoidable — the output IS the
    * token stream) + ONE shuffle on the chunk id; per-chunk state is
    * bounded by `capacity`, so the aggregation never builds more than one
    * training example in memory. Emits (chunk_id, n_tokens, n_docs,
    * chunk_md5) — the md5 stands in for shipping the chunk text to the
    * correctness harness; a production writer would emit the tokens.
    */
  def assembleChunks(df: DataFrame, textCol: String, idCol: String,
                     capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val toks = when(length(trim(col(s"`$textCol`"))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col(s"`$textCol`")), "\\s+"))
    val sized = df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`"), toks.as("__toks"))
      .withColumn("__len", size(col("__toks")).cast("long"))
    withPrefixSum(sized, idCol, "__len")
      .select(col(s"`$idCol`").as("__did"), col("start_token"),
        posexplode(col("__toks")).as(Seq("__i", "__tok")))
      .select(col("__did"), (col("start_token") + col("__i")).as("__gpos"), col("__tok"))
      .withColumn("chunk_id", expr(s"__gpos div ${capacity}L"))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("__did")).as("n_docs"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("__gpos"), col("__tok")))),
            x => x("__tok")), " ")).as("chunk_md5"))
  }

  /** Per-document packing assignment: span in the concatenated stream and
    * the `capacity`-token chunk holding its first token. Documents may
    * straddle chunk boundaries (concat-and-chunk semantics — the layout
    * never pads).
    */
  def packChunks(df: DataFrame, idCol: String, lenCol: String,
                 capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    withPrefixSum(df, idCol, lenCol)
      .select(col(s"`$idCol`"),
        col(s"`$lenCol`").cast("long").as("n_tokens"),
        col("start_token"),
        (col("start_token") + col(s"`$lenCol`")).as("end_token"),
        // integer division (Long / Long in Spark SQL is DOUBLE division,
        // exact only below 2^53 — `div` is exact at any stream length)
        expr(s"start_token div ${capacity}L").as("chunk_id"),
        pmod(col("start_token"), lit(capacity)).as("offset_in_chunk"))
  }

  /** WITHIN-document sliding-window chunking — the retrieval/embedding
    * layout next to [[packChunks]]' training layout: each doc yields
    * windows of up to `window` tokens starting at 0, stride, 2·stride, …
    * (every start < the doc's token count, so the tail is always
    * covered; the final windows may be short). Output: (doc_id,
    * chunk_idx, start_token, n_tokens, chunk_text).
    *
    * Entirely map-side — one projection of array HOFs per doc, zero
    * shuffles at any corpus size (chunking never needs cross-document
    * context; contrast the prefix-sum machinery above, which exists
    * precisely because packing does).
    */
  def slidingWindows(df: DataFrame, textCol: String, idCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(stride >= 1 && stride <= window,
      "stride must be in [1, window] (stride > window would skip tokens)")
    val toks = graft.functions.TextFns.tokens(col(s"`$textCol`"))
    df.where(col(s"`$textCol`").isNotNull)
      .select(col(s"`$idCol`").cast("long").as("doc_id"), toks.as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          // Column `/` is double division; the cast truncates toward
          // zero == floor here (size >= 1 after the filter)
          sequence(lit(0), ((size(col("__toks")) - 1) / stride).cast("int")),
          i => slice(col("__toks"), i * stride + 1, lit(window))))
          .as(Seq("chunk_idx", "__chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx") * stride).cast("long").as("start_token"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
