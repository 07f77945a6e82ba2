package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Semantic deduplication — SemDeDup (Abbas et al., "SemDeDup: Data-
  * efficient learning at web-scale through semantic deduplication", 2023;
  * public method, re-derived for Spark): cluster the embedding space with
  * a coarse k-means quantizer, call within-cluster pairs above a cosine
  * threshold semantic duplicates, keep one representative (lowest id) per
  * duplicate relation.
  *
  * The clustering IS the blocking: the quadratic pair search runs only
  * inside clusters (an equi-join on the cluster id — (n/k)² work per
  * cluster, the method's design point is k growing with the corpus), and
  * cross-cluster duplicates are deliberately out of scope (the paper's
  * own approximation). Greedy keep-lowest-id gives the INVARIANT that
  * makes the result self-checkable: no two SURVIVORS in the same cluster
  * can sit at or above the threshold — if they did, the later one was a
  * pair member and was dropped.
  */
object SemDedup {

  /** ids dropped as semantic duplicates (the higher id of every
    * qualifying within-cluster pair).
    */
  def dropIds(df: DataFrame, vecCol: String, idCol: String,
              ivf: Ivf.Model, threshold: Double): DataFrame =
    clusterPairs(df, vecCol, idCol, ivf, threshold)
      .select(col("id_b").as("id")).distinct()

  /** Within-cluster pairs at or above the cosine threshold. */
  def clusterPairs(df: DataFrame, vecCol: String, idCol: String,
                   ivf: Ivf.Model, threshold: Double): DataFrame = {
    val base = Ivf.withCluster(
        df.select(col(s"`$idCol`").as("id"), col(s"`$vecCol`").as("v")), "v", ivf)
      .withColumn("n", VectorFns.norm2(col("v")))
    base.as("a").join(base.as("b"),
        col("a.__cluster") === col("b.__cluster") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (VectorFns.dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n"))).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** The semantically deduplicated frame (original columns). */
  def semDedup(df: DataFrame, vecCol: String, idCol: String,
               ivf: Ivf.Model, threshold: Double): DataFrame = {
    val drops = dropIds(df, vecCol, idCol, ivf, threshold)
      .withColumnRenamed("id", "__drop_id")
    df.join(drops, df(idCol) === col("__drop_id"), "left_anti")
  }
}
