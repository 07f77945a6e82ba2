package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Packing, QualityModel, Sampling}

/** Cross-operator compositions a real training-data build chains: the
  * learned tokenizer feeds sequence packing (budgets are BPE tokens,
  * not whitespace tokens), and the learned quality score feeds soft
  * sampling — each stage's output is the next one's input with no glue
  * beyond column selection.
  */
class PipelineCompositionSpec extends SparkSuite {
  import spark.implicits._

  test("BPE token counts feed sequence packing: chunk budgets are true tokenizer tokens") {
    val docs = Seq(
      (1L, "aaab ab"), (2L, "aaab aaab aaab"), (3L, "ab ab"), (4L, "aab"))
      .toDF("doc_id", "text")
    val merges = Bpe.learnMerges(Bpe.wordFrequencies(docs, "text"), numMerges = 8)
    val enc = Bpe.encode(docs, "text", "doc_id", merges)
    // with the full merge table every training word is one token
    val counts = enc.select("id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 2L, 2L -> 3L, 3L -> 2L, 4L -> 1L))
    // pack by the BPE count: token budgets are TOKENIZER tokens
    val packed = Packing.packChunks(enc, "id", "n_bpe_tokens", capacity = 3L)
      .select("id", "chunk_id", "offset_in_chunk")
      .as[(Long, Long, Long)].collect()
      .map { case (id, c, o) => id -> ((c, o)) }.toMap
    // id order: 1:[0,2) 2:[2,5) 3:[5,7) 4:[7,8)
    assert(packed === Map(1L -> ((0L, 0L)), 2L -> ((0L, 2L)),
      3L -> ((1L, 2L)), 4L -> ((2L, 1L))))
  }

  test("learned quality score feeds soft sampling: keep probability = model score") {
    // separable corpus: even ids look 'good' (positive feature), odd bad
    val docs = (1L to 400L).map { i =>
      (i, Seq(1.0, if (i % 2 == 0) 1.0 else -1.0), if (i % 2 == 0) 1.0 else 0.0)
    }.toDF("doc_id", "f", "y")
    val w = QualityModel.trainLogistic(docs, "f", "y", dim = 2, steps = 40, lr = 1.0)
    val scored = QualityModel.score(docs, "f", w)
    val kept = scored.where(Sampling.byScoreProbabilityPredicate(
        col("doc_id"), col("quality_score"), seed = 7L))
      .select("doc_id").as[Long].collect()
    val (evens, odds) = kept.partition(_ % 2 == 0)
    // scores converge toward 1 for evens, 0 for odds: nearly all evens
    // kept, nearly all odds dropped — and the decision is deterministic
    assert(evens.length > 180, s"evens kept: ${evens.length}")
    assert(odds.length < 20, s"odds kept: ${odds.length}")
    val again = scored.where(Sampling.byScoreProbabilityPredicate(
        col("doc_id"), col("quality_score"), seed = 7L))
      .select("doc_id").as[Long].collect()
    assert(kept.sorted.toSeq === again.sorted.toSeq)
  }
}
