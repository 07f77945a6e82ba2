package graft
/** Dev-only: phase timing for q57's three dedup passes at a given SF. */
object Q57Time {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.init(Sessions.builder("local[32]", 32).getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q57] $name%-18s ${(System.nanoTime()-t0)/1e9}%5.2f s"); r
    }
    // replicate the q57 body with timers
    val docs = Tables(spark, dir, "documents").where(col("text").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = phase("signatures") {
      val s = graft.operators.Dedup.minhashSignaturesGen(docs, "doc_id", "text", 3, 64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    def freshIx() = new graft.streaming.StreamingDedup.LshIndex(
      java.nio.file.Files.createTempDirectory("q57t").toString + "/ix",
      shingleN = 3, numHashes = 64, bands = 16, threshold = 0.9)
    val ix = freshIx()
    val mid = phase("mid probe") {
      docs.agg(expr("approx_percentile(doc_id, 0.5)")).head().getLong(0) }
    val s1 = phase("pass 1 (append)") { ix.dedupeBatch(docs.where(col("doc_id") <= mid),
      "text", "doc_id", precomputedSig = Some(sig.where(col("id") <= mid))) }
    val s2 = phase("pass 2 (probe+append)") { ix.dedupeBatch(docs.where(col("doc_id") > mid),
      "text", "doc_id", precomputedSig = Some(sig.where(col("id") > mid))) }
    val oneShot = phase("pass 3 (comparator)") { freshIx().dedupeBatch(docs, "text", "doc_id",
      precomputedSig = Some(sig), appendToIndex = false).select("doc_id") }
    phase("gate action") {
      graft.queries.Gates.setParity(
        s1.select("doc_id").union(s2.select("doc_id")), oneShot, "doc_id").count() }
    spark.stop()
  }
}
