package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Packing

/** The distributed prefix sum must be ARITHMETICALLY identical to the
  * single-partition global window it replaces (q75's oracle re-checks it
  * against DuckDB; this pins the equivalence standalone, across skewed
  * partition layouts).
  */
class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("distributed prefix sum == global-window cumsum, on a skewed frame") {
    // skewed lengths + non-contiguous ids, shuffled input order
    val rows = ((0L until 500L).map(i => (i * 7 % 1000, (i % 13) * (i % 7) + 1)) ++
      Seq((5000L, 100000L), (5001L, 1L))).sortBy(t => t._1 % 17)
    val df = rows.toDF("id", "len").repartition(7)
    val dist = Packing.withPrefixSum(df, "id", "len")
      .select("id", "start_token").as[(Long, Long)].collect().toMap
    val naive = df.select(col("id"),
        coalesce(sum("len").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(dist === naive)
  }

  test("assembleChunks: chunks reassemble the exact concatenated stream") {
    val df = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"))
      .toDF("doc_id", "text")
    val out = Packing.assembleChunks(df, "text", "doc_id", capacity = 4L)
      .orderBy("chunk_id")
      .select("chunk_id", "n_tokens", "n_docs", "chunk_md5")
      .as[(Long, Long, Long, String)].collect().toSeq
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // stream = a b c d | e f g h | i — docs straddle boundaries, no padding
    assert(out === Seq(
      (0L, 4L, 2L, md5("a b c d")),
      (1L, 4L, 2L, md5("e f g h")),
      (2L, 1L, 1L, md5("i"))))
  }

  test("packChunks: spans tile the stream; chunk assignment consistent") {
    val df = Seq((1L, 300L), (2L, 300L), (3L, 10L), (4L, 500L))
      .toDF("doc_id", "len")
    val out = Packing.packChunks(df, "doc_id", "len", capacity = 512L)
      .orderBy("doc_id")
      .select("doc_id", "start_token", "end_token", "chunk_id", "offset_in_chunk")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 300L, 0L, 0L),
      (2L, 300L, 600L, 0L, 300L),   // straddles the chunk boundary
      (3L, 600L, 610L, 1L, 88L),
      (4L, 610L, 1110L, 1L, 98L)))
  }

  test("slidingWindows: stride starts, short tail windows, blank/null drop, bad stride rejected") {
    val docs = Seq(
      (1L, "a b c d e f g"),            // 7 tokens
      (2L, "x y"),                      // shorter than the window
      (3L, "   "),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Packing.slidingWindows(docs, "text", "doc_id",
        window = 3, stride = 2)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "start_token", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, 0L, 3L, "a b c"),
      (1L, 1L, 2L, 3L, "c d e"),
      (1L, 2L, 4L, 3L, "e f g"),
      (1L, 3L, 6L, 1L, "g"),            // tail window, short
      (2L, 0L, 0L, 2L, "x y")))
    intercept[IllegalArgumentException](
      Packing.slidingWindows(docs, "text", "doc_id", window = 3, stride = 4))
  }
}
