package graft.tools

import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.functions.TextFns
import graft.operators.Dedup

/** Dev-only micro-profiler: decomposes the hot bench queries into stages and
  * times each (count() to force execution). Not part of the shipped surface.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.init(Sessions.builder("local[16]", 16).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = Tables(spark, sfDir, "documents")
      .where(length(trim(col("text"))) > 0).cache()
    time("docs cache")(docs.count())

    // q60 prefix-path decomposition
    {
      import org.apache.spark.sql.expressions.Window
      val sh = docs.select(col("doc_id").as("id"),
          graft.functions.SketchExpressions.wordShingles(col("text"), 3).as("sh"))
        .withColumn("n_sh", size(col("sh")))
        .where(col("n_sh") > 0)
        .persist()
      time("q60a shingles persist")(sh.count())
      val exploded = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("s"))
      val dfreq = exploded.groupBy("s").agg(count(lit(1)).as("df")).persist()
      time("q60b dfreq")(dfreq.count())
      val prefixLen = (col("n_sh") - ceil(col("n_sh") * 0.6) + 1).cast("int")
      val ranked = exploded.join(dfreq, "s")
        .withColumn("rk", row_number().over(
          Window.partitionBy("id").orderBy(col("df").asc, col("s").asc)))
        .where(col("rk") <= prefixLen)
        .select("id", "s").persist()
      time("q60c ranked prefix")(ranked.count())
      val ca = ranked.as("a"); val cb = ranked.as("b")
      val candidates = ca.join(cb,
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b").persist()
      time("q60d candidates")(println(s"  candidates=${candidates.count()}"))
      val shA = sh.select(col("id").as("id_a"), col("sh").as("sh_a"), col("n_sh").as("na"))
      val shB = sh.select(col("id").as("id_b"), col("sh").as("sh_b"), col("n_sh").as("nb"))
      val verified = candidates.join(shA, "id_a").join(shB, "id_b")
        .withColumn("inter",
          graft.functions.SketchExpressions.sortedIntersectSize(col("sh_a"), col("sh_b")))
        .withColumn("jaccard",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .where(col("jaccard") >= 0.6)
      time("q60e verify")(verified.count())
      Seq(sh, dfreq, ranked, candidates).foreach(_.unpersist())
    }

    // q36 decomposition
    val sig = Dedup.minhashSignaturesGen(docs, "doc_id", "text", 3, 64)
    time("q36a signatures")(sig.count())
    val sigC = sig.cache(); sigC.count()
    time("q36b lsh pairs from cached sigs") {
      // replicate banding + join from minhashLshPairs
      val banded = sigC.select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(15)),
          b => struct(b.as("band"),
            xxhash64(slice(col("sig"), b * 4 + 1, lit(4)).cast("string"), b).as("bh"))))
          .as("bucket"))
        .select(col("id"), col("sig"), col("bucket.band"), col("bucket.bh"))
      val a = banded.as("a"); val b = banded.as("b")
      a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
        .dropDuplicates("id_a", "id_b")
        .withColumn("est_jaccard",
          size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
            .cast("double") / 64)
        .where(col("est_jaccard") >= 0.5).count()
    }
    time("q36 full")(Dedup.minhashLshPairs(docs, "text", "doc_id").count())
    time("q37 simhash sigs") {
      Dedup.simhashSignatures(docs, "doc_id", TextFns.tokens(col("text"))).count()
    }
    time("q37 full")(Dedup.simhashPairs(docs, "text", "doc_id").count())
    time("q38 exact inverted-index")(Dedup.ngramJaccardPairs(docs, "text", "doc_id").count())
    time("q38 lsh-blocked")(Dedup.ngramJaccardViaLsh(docs, "text", "doc_id").count())


    // q52 decomposition
    val cfg = graft.corpus.CorpusPipeline.Config(
      minTokens = 3, minQuality = 0.1, nearDupThreshold = 0.9)
    val annotated = time("q52a annotate+cache") {
      val a = graft.corpus.CorpusPipeline.annotate(docs, cfg).cache()
      a.count(); a
    }
    time("q52 full")(graft.corpus.CorpusPipeline.run(docs, cfg).corpus.count())
    spark.stop()
  }
}
