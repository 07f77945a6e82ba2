package graft

import org.apache.spark.sql.functions._
import graft.corpus.CorpusPipeline
import graft.functions.TextFns
import graft.operators.Dedup

class CorpusPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("connected components groups chained pairs into one cluster") {
    // chain 1~2, 2~3 plus isolated pair 10~11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L)
    assert(cc(10L) === 10L && cc(11L) === 10L)
    // distributed label-propagation fallback must agree
    val dist = Dedup.connectedComponentsDistributed(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === cc)
  }

  test("CC routing: over-cap edge lists take the distributed path with NO driver collect") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val funcs = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        funcs.add(funcName)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        funcs.add(funcName)
    }
    spark.listenerManager.register(listener)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
      // cap 2 < 3 edges -> the distributed path; the routing decision must
      // be a count() probe (executor-side, O(cap)) — never a collect of
      // the capped edge list (at the 5M default that is hundreds of MB of
      // rows on the driver, wasted entirely when this branch is taken).
      val out = Dedup.connectedComponents(pairs, driverMaxEdges = 2)
      // listener events are async: wait until the probe's count shows up,
      // then snapshot BEFORE this test's own collect below.
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline && !funcs.asScala.contains("count"))
        Thread.sleep(50)
      val during = funcs.asScala.toList
      assert(during.contains("count"), s"routing probe should run as count(): $during")
      assert(!during.contains("collect"),
        s"over-cap route must not materialize edges on the driver: $during")
      val cc = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L)
      assert(cc(10L) === 10L && cc(11L) === 10L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("CC computes the upstream pair plan ONCE on both routes (persisted across the probe)") {
    // The caller's pair frame is typically an un-persisted LSH pair search
    // — the dominant cost of clustering-backed dedup. The routing probe
    // (limit(cap+1).count()) plus the follow-up collect/propagation must
    // cost ONE evaluation of that plan, not two: an accumulator inside the
    // upstream plan counts per-row evaluations.
    def countedPairs(acc: org.apache.spark.util.LongAccumulator) =
      Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDS()
        .map { t => acc.add(1); t }
        .toDF("id_a", "id_b")
    // under-cap (driver union-find) route
    val a1 = spark.sparkContext.longAccumulator("pairEvalsHybrid")
    val cc1 = Dedup.connectedComponents(countedPairs(a1), driverMaxEdges = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1.value === 3L,
      s"hybrid route evaluated the pair plan ${a1.value / 3.0}x — must be exactly once")
    assert(cc1(3L) === 1L && cc1(11L) === 10L)
    // over-cap (distributed propagation) route — the propagation reads the
    // same cached frame, so the pair search still runs once.
    val a2 = spark.sparkContext.longAccumulator("pairEvalsDistributed")
    val cc2 = Dedup.connectedComponents(countedPairs(a2), driverMaxEdges = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a2.value === 3L,
      s"distributed route evaluated the pair plan ${a2.value / 3.0}x — must be exactly once")
    assert(cc2 === cc1)
  }

  test("keepBestInCluster keeps the highest-scoring member; loners survive") {
    // cluster {1,2,3}: doc 2 scores highest; cluster {10,11}: tie on score
    // breaks to the lower id; docs 20, 21 are in no cluster.
    val docs = Seq(
      (1L, 5.0), (2L, 9.0), (3L, 7.0),
      (10L, 4.0), (11L, 4.0),
      (20L, 1.0), (21L, 0.0)
    ).toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "label")
    val kept = Dedup.keepBestInCluster(docs, "doc_id", clusters, col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 10L, 20L, 21L))
  }

  test("distributed CC converges on a chain far longer than one-hop-per-iteration would allow") {
    // diameter-39 path: min-label needs 39 one-hop rounds; pointer jumping
    // must close it within the iteration cap (and throw if it ever can't).
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponentsDistributed(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size === 40)
    assert(cc.values.toSet === Set(1L))
  }

  test("LSH-blocked ngram jaccard agrees with the exact inverted-index variant") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
      .where(length(trim(col("text"))) > 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e4) / 1e4)).toSet
    val exact = pairs(Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.6))
    val lsh   = pairs(Dedup.ngramJaccardViaLsh(docs, "text", "doc_id", n = 3, threshold = 0.6))
    // LSH blocking can only lose pairs, never invent them; at this corpus
    // and threshold it must keep them all.
    assert(lsh === exact)
  }

  test("prefix-filtered ngram jaccard equals the exact inverted-index variant") {
    // the AllPairs prefix bound is COMPLETE: identical pairs at multiple
    // thresholds, including ones that stress the ceil() boundary
    val docs = Tables(spark, sf("sf0.001"), "documents")
      .where(length(trim(col("text"))) > 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e4) / 1e4)).toSet
    Seq(0.4, 0.6, 0.85).foreach { t =>
      val exact  = pairs(Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3, threshold = t))
      val prefix = pairs(Dedup.ngramJaccardPrefixFiltered(docs, "text", "doc_id", n = 3, threshold = t))
      assert(prefix === exact, s"threshold $t")
    }
  }

  test("skew-guarded ngram jaccard: cap-tripped path equals the uncapped result") {
    // maxPostingLen = 1 trips on ANY shared shingle, forcing the prefix
    // fallback for the entire corpus; ≤0 disables the guard (pure
    // inverted-index join). Same pairs at three thresholds.
    val docs = Tables(spark, sf("sf0.001"), "documents")
      .where(length(trim(col("text"))) > 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e4) / 1e4)).toSet
    Seq(0.4, 0.6, 0.85).foreach { t =>
      val uncapped = pairs(Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3,
        threshold = t, maxPostingLen = 0L))
      val tripped  = pairs(Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3,
        threshold = t, maxPostingLen = 1L))
      assert(tripped === uncapped, s"threshold $t")
    }
  }

  test("LSH-blocked cosine dup pairs are a subset of the exact all-pairs result") {
    import graft.operators.Similarity
    val emb = Tables(spark, sf("sf0.001"), "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineDupPairsExact(emb, "embedding", "vec_id", 0.35))
    val lsh   = pairs(Similarity.cosineDupPairs(emb, "embedding", "vec_id", 0.35,
      bandBits = 8, bands = 16))
    assert(lsh.subsetOf(exact))
    assert(exact.nonEmpty)
  }

  test("blocked exact cosine pairs == naive exact (pairs AND cosines), any orientation") {
    import graft.operators.Similarity
    val emb = Tables(spark, sf("sf0.001"), "embeddings")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // bit-identical cosines required (the q44 oracle hashes them)
    assert(rows(Similarity.cosineDupPairsExactBlocked(emb, "embedding", "vec_id", 0.35,
        blocks = 7)) ===
      rows(Similarity.cosineDupPairsExact(emb, "embedding", "vec_id", 0.35)))
  }

  test("SemDeDup: planted semantic duplicates collapse to the lowest id; invariant holds") {
    import graft.operators.{Ivf, SemDedup}
    import spark.implicits._
    def vec(seed: Long): Seq[Float] = (0 until 16).map { i =>
      val h = ((seed * 2654435761L + i * 40503L) & 0xffffL).toFloat
      (h / 65535.0f) * 2.0f - 1.0f
    }
    // 60 base vectors + 3 near-copies of vector 7 (same direction, tiny
    // perturbation -> same k-means cell, cosine ~1).
    val base = (0L until 60L).map(s => (s, vec(s)))
    val copies = (0 until 3).map(j =>
      (100L + j, vec(7L).zipWithIndex.map { case (x, i) =>
        x + (if (i % 5 == j % 5) 0.01f else 0.0f) }))
    val emb = (base ++ copies).toDF("vec_id", "embedding")
    val ivf = Ivf.train(emb, "embedding", "vec_id", k = 4, iters = 2)
    val kept = SemDedup.semDedup(emb, "embedding", "vec_id", ivf, threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    // all three copies dropped, their source (lowest id of the group) kept
    assert(kept.contains(7L))
    assert(Seq(100L, 101L, 102L).forall(!kept.contains(_)))
    // the self-check invariant: survivors contain no same-cluster pair >= t
    val leftover = SemDedup.clusterPairs(
      emb.where(col("vec_id").isin(kept.toSeq: _*)), "embedding", "vec_id",
      ivf, threshold = 0.95)
    assert(leftover.count() === 0)
  }

  test("banded-LSH cosine dup pairs: FULL recall on planted near-dups (its intended regime)") {
    import graft.operators.Similarity
    import spark.implicits._
    // 200 base vectors (deterministic hash noise, near-orthogonal) + 40
    // planted near-duplicates (small deterministic perturbation — cosine
    // vs their source ≥ ~0.95).
    def vec(seed: Long, dim: Int): Seq[Float] =
      (0 until dim).map { i =>
        val h = ((seed * 2654435761L + i * 40503L) & 0xffffL).toFloat
        (h / 65535.0f) * 2.0f - 1.0f
      }
    val base = (0L until 200L).map(s => (s, vec(s, 32)))
    val dups = (0L until 40L).map { j =>
      val src = base(j.toInt * 5)
      (1000L + j, src._2.zipWithIndex.map { case (x, i) =>
        x + (if (i % 7 == 0) 0.02f else 0.0f) })
    }
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact   = pairs(Similarity.cosineDupPairsExact(emb, "embedding", "vec_id", 0.9))
    val blocked = pairs(Similarity.cosineDupPairs(emb, "embedding", "vec_id", 0.9))
    assert(exact.size >= 40)             // every planted dup qualifies
    assert(blocked === exact)            // banding recalls ALL of them
  }

  test("corpus pipeline: monotonic reductions, no surviving exact dups") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val res = CorpusPipeline.run(docs, CorpusPipeline.Config(
      minTokens = 3, minQuality = 0.1, nearDupThreshold = 0.9))
    val s = res.stats
    assert(s.input >= s.afterQuality)
    assert(s.afterQuality >= s.afterExactDedup)
    assert(s.afterExactDedup >= s.afterNearDedup)
    assert(s.afterNearDedup > 0)
    // exact-dup freedom: every normalized fingerprint appears once
    val fpDups = res.corpus
      .groupBy(TextFns.fingerprint(col("text"))).count()
      .where(col("count") > 1).count()
    assert(fpDups === 0)
  }

  test("keepBestPerCluster: chain cluster keeps the top score (ties low id); singletons survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, 1L),    // cluster {1,2,3} via the chain below
      (2L, 5L),    // highest score in the cluster -> survivor
      (3L, 5L),    // same score, higher id -> loses the tie
      (4L, 0L))    // no pair: singleton, survives at any score
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = graft.operators.Dedup.keepBestPerCluster(
        docs, pairs, "doc_id", "score")
      .select("doc_id", "cluster_label", "score")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((2L, 1L, 5L), (4L, 4L, 0L)))
    // scoreCol = constant degenerates to the keep-lowest-id rule
    val lowId = graft.operators.Dedup.keepBestPerCluster(
        docs.withColumn("c", org.apache.spark.sql.functions.lit(0)),
        pairs, "doc_id", "c")
      .select("doc_id").as[Long].collect().toSet
    assert(lowId === Set(1L, 4L))
  }
}
