package graft.corpus

import org.apache.spark.sql.DataFrame
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

  /** The manifest: per shard — row count, token total, and an
    * order-independent content fingerprint (md5 over the sorted id
    * list) a loader or a later audit can verify the shard files
    * against. One shard-keyed aggregation; the id lists inside are
    * shard-sized (corpus/nShards — size nShards to taste).
    */
  def shardManifest(docs: DataFrame, idCol: String, tokenCol: String,
                    nShards: Int): DataFrame =
    withShard(docs, idCol, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col(s"`$tokenCol`")).cast("long").as("n_tokens"),
        md5(concat_ws(",",
          sort_array(collect_list(col(s"`$idCol`"))))).as("ids_md5"))

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
