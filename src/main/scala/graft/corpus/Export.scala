package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shipping a release: deterministic sharding + an integrity manifest —
  * the step between a finished corpus and a training job's data loader
  * (WebDataset/Mosaic-style shard layouts: N roughly-equal pieces, a
  * manifest recording what each piece must contain).
  *
  * Shard assignment reuses the split-hash machinery
  * ([[Splits.splitExpr]] over N equal fractions): a pure function of the
  * row key — map-side, zero shuffle, append-stable (old rows keep their
  * shard when the corpus grows), partition-layout independent, and
  * mirrorable by any other engine (the md5-threshold rule, not a
  * JVM-private hash). Balance is statistical (hash-uniform), which is
  * what a loader wants; exact-size packing is [[graft.operators
  * .Packing]]'s job at sequence level, not the shard layout's.
  */
object Export {

  /** Tag every row with its shard in [0, nShards): md5-threshold
    * assignment keyed on `idCol`. Map-side, zero shuffle.
    */
  def withShard(docs: DataFrame, idCol: String, nShards: Int,
                shardCol: String = "shard"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!docs.columns.contains(shardCol),
      s"shard column '$shardCol' collides with an input column")
    val fractions = (0 until nShards)
      .map(i => i.toString -> 1.0 / nShards)
    docs.withColumn(shardCol,
      Splits.splitExpr(col(s"`$idCol`"), fractions).cast("int"))
  }

  /** Per-row 48-bit id hash for the manifest fingerprint: the first 12
    * hex digits of `md5(cast(id as string))`, parsed to a long. Engine-
    * mirrorable (DuckDB: `CAST('0x' || substr(md5(..), 1, 12) AS
    * BIGINT)`), and 48 bits keeps every value comfortably inside both a
    * double and a long while `sum` over billions of rows stays within
    * DECIMAL(38,0).
    */
  def idFingerprint(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long")

  /** The manifest: per shard — row count, token total, and an
    * order-independent multiset fingerprint of the id column a loader
    * or a later audit verifies the shard files against:
    * `(n_docs, sum(h48(id)) rendered as a decimal STRING,
    * bit_xor(h48(id)))` with [[idFingerprint]] as h48. The sum exceeds
    * 2^53 from tiny corpora up, so the oracle-facing column is a STRING
    * (exact digits, no float path anywhere downstream) while the
    * internal accumulator stays DECIMAL(38,0). Both combines are
    * COMMUTATIVE and
    * mergeable, so the aggregation is partial-agged (map-side combine)
    * and constant-space per shard — a shard of billions of ids costs a
    * few bytes of state, never a materialized id list (the
    * `collect_list`+`sort_array` form this replaces buffered the whole
    * shard's ids in ONE aggregation buffer — the 100 TB OOM).
    */
  def shardManifest(docs: DataFrame, idCol: String, tokenCol: String,
                    nShards: Int): DataFrame = {
    val h = idFingerprint(col(s"`$idCol`"))
    withShard(docs, idCol, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(s"`$tokenCol`")).cast("long").as("n_tokens"),
        sum(h.cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("string").as("ids_fp_sum"),
        bit_xor(h).as("ids_fp_xor"))
  }

  /** Write the corpus as `<dir>/shard=<i>/…parquet` plus
    * `<dir>/_manifest` (the [[shardManifest]] frame) — one shuffle on
    * the shard key so each shard is one writer group's files. Returns
    * the manifest as read back from disk.
    */
  def writeShards(docs: DataFrame, idCol: String, tokenCol: String,
                  nShards: Int, dir: String): DataFrame = {
    val spark = docs.sparkSession
    val sharded = withShard(docs, idCol, nShards)
    sharded
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    shardManifest(docs, idCol, tokenCol, nShards)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_manifest")
    spark.read.parquet(s"$dir/_manifest")
  }
}
