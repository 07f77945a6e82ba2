package graft

import java.awt.image.BufferedImage

import graft.multimodal.Multimodal
import graft.operators.Dedup

class PerceptualHashSpec extends SparkSuite {
  import spark.implicits._

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** 64x64 bimodal block pattern (8x8 blocks at luminance 40 or 220):
    * every aHash cell sits FAR from the mean, so the hash is stable under
    * re-encode and light noise — the regime perceptual dedup targets. (A
    * smooth gradient is the pathological opposite: half its cells ride
    * the mean knife-edge and flip on any wobble.)
    */
  private def gradient(invert: Boolean): BufferedImage = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val bright = ((x / 8) * 31 + (y / 8) * 17) % 3 < 2
      val v = if (bright ^ invert) 220 else 40
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("aHash64: stable under re-encode and light noise, far for distinct images") {
    val base = gradient(invert = false)
    val hPng = Multimodal.aHash64(encode(base, "png")).get
    val hJpg = Multimodal.aHash64(encode(base, "jpg")).get
    assert(hamming(hPng, hJpg) <= 6, s"re-encode moved ${hamming(hPng, hJpg)} bits")
    // light noise: bump a few pixels slightly
    val noisy = gradient(invert = false)
    Seq((3, 7), (40, 22), (12, 55), (60, 60), (31, 31)).foreach { case (x, y) =>
      val p = noisy.getRGB(x, y)
      val v = math.min(255, ((p >> 16) & 0xFF) + 4)
      noisy.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val hNoise = Multimodal.aHash64(encode(noisy, "png")).get
    assert(hamming(hPng, hNoise) <= 6)
    // the inverted gradient is its perceptual opposite
    val hInv = Multimodal.aHash64(encode(gradient(invert = true), "png")).get
    assert(hamming(hPng, hInv) >= 40, s"only ${hamming(hPng, hInv)} bits apart")
    // undecodable payload: no hash, no fabricated near-dups
    assert(Multimodal.aHash64(Array.fill(64)(7.toByte)).isEmpty)
  }

  test("nearDupImagePairs: planted re-encodes pair up; distinct and broken don't") {
    val base = encode(gradient(invert = false), "png")
    val reenc = encode(gradient(invert = false), "jpg")
    val other = encode(gradient(invert = true), "png")
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", base, "mem://a.png"),
      Multimodal.MediaRecord(2L, "image", reenc, "mem://a.jpg"),
      Multimodal.MediaRecord(3L, "image", other, "mem://b.png"),
      Multimodal.MediaRecord(4L, "image", Array.fill(50)(1.toByte), "mem://junk")
    ).toDS()
    val pairs = Multimodal.nearDupImagePairs(media, maxDist = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    // undecodable row dropped before hashing
    assert(Multimodal.imageHashes(media).select("id").as[Long].collect().toSet
      === Set(1L, 2L, 3L))
  }

  test("hammingPairs: pigeonhole recall at the distance bound, exact filter above it") {
    // maxDist=5 -> 6 balanced chunks (widths 11,11,11,11,10,10). Flips in
    // 5 DIFFERENT chunks leave chunk 5 shared: the worst spread still
    // blocks.
    val spread = Seq(0, 12, 24, 36, 48).foldLeft(0L)((s, b) => s | (1L << b))
    // 6 flips inside chunk 0: shares chunks 1-5 (candidate) but distance
    // 6 > 5 must be filtered by the exact verify.
    val dense6 = (0 until 6).foldLeft(0L)((s, b) => s | (1L << b))
    val sigs = Seq((1L, 0L), (2L, spread), (3L, dense6)).toDF("id", "sig")
    val got = Dedup.hammingPairs(sigs, maxDist = 5)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(got.contains((1L, 2L, 5)))
    assert(!got.exists(p => p._1 === 1L && p._2 === 3L))
    // maxDist=0 degenerates to exact equality through ONE 64-bit chunk
    // (mask-width regression guard: 1L<<64 wraps)
    val eq = Seq((1L, 42L), (2L, 42L), (3L, 43L)).toDF("id", "sig")
    assert(Dedup.hammingPairs(eq, maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet === Set((1L, 2L)))
  }

  test("hammingPairs: full recall at maxDist values where ceil-width chunking broke down") {
    // maxDist=11 -> 12 chunks. A ceil-width scheme (width 6) runs out of
    // bits after chunk 10 (60+4 bits) and chunk 11 got a NEGATIVE width —
    // a pair with one flip per REAL chunk then agreed on no chunk and was
    // silently missed. The balanced partition (widths 6*4 then 5*8,
    // offsets 0,6,12,18,24,29,34,39,44,49,54,59) guarantees chunk 11
    // agreement for this worst-case spread.
    val offsets11 = Seq(0, 6, 12, 18, 24, 29, 34, 39, 44, 49, 54)
    val spread11 = offsets11.foldLeft(0L)((s, b) => s | (1L << b))
    val sigs = Seq((1L, 0L), (2L, spread11)).toDF("id", "sig")
    val got = Dedup.hammingPairs(sigs, maxDist = 11)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 11)), s"distance-11 worst-spread pair missed: $got")
    // Exhaustive partition check across every legal maxDist: the balanced
    // widths must be positive and tile exactly 64 bits (this is the
    // invariant the old scheme violated for maxDist in {8,11,13,14,16-30,
    // 32-62} via zero- or negative-width chunks).
    (0 until 64).foreach { d =>
      val chunks = d + 1
      val base = 64 / chunks; val rem = 64 % chunks
      val widths = (0 until chunks).map(c => base + (if (c < rem) 1 else 0))
      assert(widths.forall(_ >= 1) && widths.sum === 64, s"maxDist=$d widths=$widths")
    }
    // Spot-check a previously zero-width-degenerate value end to end:
    // maxDist=16 must still verify exactly (far pair filtered, equal kept).
    val eq16 = Seq((1L, 7L), (2L, 7L), (3L, -1L)).toDF("id", "sig")
    assert(Dedup.hammingPairs(eq16, maxDist = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet === Set((1L, 2L)))
  }

  test("audioHash64: gain-invariant, far across patterns, None on junk/short") {
    import graft.queries.MultimodalQueries
    // two gain variants of group 0 hash identically (energy RATIO
    // threshold), and the hash equals the generating pattern exactly
    val a1 = MultimodalQueries.renderAudioAsset(3L)     // group 3, scale .5
    val a2 = MultimodalQueries.renderAudioAsset(35L)    // group 3, scale .9
    val h1 = Multimodal.audioHash64(a1.payload).get
    val h2 = Multimodal.audioHash64(a2.payload).get
    assert(h1 === h2)
    assert(h1 === MultimodalQueries.groupPattern(3L))
    // different group: far apart (pattern family min distance 25)
    val b = MultimodalQueries.renderAudioAsset(4L)      // group 4
    assert(hamming(h1, Multimodal.audioHash64(b.payload).get) >= 20)
    // undecodable + too-short payloads produce no hash
    assert(Multimodal.audioHash64(Array.fill(64)(7.toByte)).isEmpty)
  }

  test("q106 rendered-corpus audio near-dup: pairs == same-group decodable pairs") {
    import graft.queries.MultimodalQueries
    val dir = sf("sf0.001")
    val got = MultimodalQueries.defs("q106_audio_neardup")(spark, dir)
      .as[(Long, Long)].collect().toSet
    val sel = Tables(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.expr("doc_id % 7 = 3 AND doc_id % 13 <> 5"))
      .select("doc_id").as[Long].collect().sorted
    val want = (for {
      i <- sel.indices; j <- i + 1 until sel.length
      if sel(i) % 8 == sel(j) % 8
    } yield (sel(i), sel(j))).toSet
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }

  test("hammingPairsBy: the key BLOCKS — cross-key twins never pair; within-key = brute force") {
    // ids 1/2 share sig at key 0; ids 3/4 share the SAME sig but at
    // different keys — identical signatures, zero emitted pairs.
    val rows = Seq(
      (0, 1L, 0x0F0FL), (0, 2L, 0x0F0FL),
      (0, 3L, 0xABCDL), (1, 4L, 0xABCDL),
      (1, 5L, 0x1111L), (1, 6L, 0x1110L)
    ).toDF("frame_idx", "id", "sig")
    val got = Dedup.hammingPairsBy(rows, "frame_idx", maxDist = 3)
      .select("frame_idx", "id_a", "id_b")
      .as[(Int, Long, Long)].collect().toSet
    assert(got === Set((0, 1L, 2L), (1, 5L, 6L)))
  }

  test("nearDupVideoPairsFromHashes: majority vote over aligned frames, min-frame-span rule") {
    // assets: 10/11 same on all 4 frames; 12 matches 10 on frame 0 only
    // (1 of 4 < the 0.5 majority); 13 has just 2 frames, both matching 10
    // (2 of min(2,4)=2 -> pairs even at frac 1.0).
    def sig(k: Int, distinct: Boolean) =
      if (distinct) 0x5555000000000000L + k * 1024 + 512 else k * 8L
    val fh = Seq(
      (10L, 0, sig(0, false)), (10L, 1, sig(1, false)), (10L, 2, sig(2, false)), (10L, 3, sig(3, false)),
      (11L, 0, sig(0, false)), (11L, 1, sig(1, false)), (11L, 2, sig(2, false)), (11L, 3, sig(3, false)),
      (12L, 0, sig(0, false)), (12L, 1, sig(1, true)), (12L, 2, sig(2, true)), (12L, 3, sig(3, true)),
      (13L, 0, sig(0, false)), (13L, 1, sig(1, false))
    ).toDF("id", "frame_idx", "sig")
    val got = Multimodal.nearDupVideoPairsFromHashes(fh, maxDist = 3, minFrameFrac = 0.5)
      .select("id_a", "id_b", "matched_frames", "min_frames")
      .as[(Long, Long, Long, Long)].collect().toSet
    // (12,13) pairs too: their common span is only frames {0,1} and
    // frame 0 matches — 1 >= ceil(0.5 * 2). The short-span rule is
    // deliberate (a clip matching its full overlap with a longer video
    // is a near-dup); the strict check below shows frac 1.0 rejects it.
    assert(got === Set((10L, 11L, 4L, 4L), (10L, 13L, 2L, 2L),
      (11L, 13L, 2L, 2L), (12L, 13L, 1L, 2L)))
    // at frac 1.0 the short asset still pairs (its whole span matches);
    // the 1-of-4 partial match still doesn't
    val strict = Multimodal.nearDupVideoPairsFromHashes(fh, maxDist = 3, minFrameFrac = 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(strict === Set((10L, 11L), (10L, 13L), (11L, 13L)))
  }

  test("videoHashes64: majority fold — identical sequences collide, index route matches exact route") {
    // hand-built: asset 1/2 share all frames -> identical signature;
    // asset 3 shares 1 of 4 frames with 1 -> the shared frame's bits are
    // a 1-of-4 minority wherever the other three frames disagree
    val fh = Seq(
      (1L, 0, 0xF0F0F0F0L), (1L, 1, 0x0F0FL), (1L, 2, 0xAAAAL), (1L, 3, 0x5555L),
      (2L, 0, 0xF0F0F0F0L), (2L, 1, 0x0F0FL), (2L, 2, 0xAAAAL), (2L, 3, 0x5555L),
      (3L, 0, 0xF0F0F0F0L), (3L, 1, 0x33CCL), (3L, 2, 0xCC33L), (3L, 3, 0x1248L)
    ).toDF("id", "frame_idx", "sig")
    val sigs = Multimodal.videoHashes64(fh)
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    // index route over the rendered q113 corpus: one word per asset,
    // same pair set as the aligned-frame exact route (same-group videos
    // share ALL frames; cross-group majorities diverge far past the bound)
    import graft.queries.MultimodalQueries
    val dir = sf("sf0.001")
    val media = Tables(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.expr("doc_id % 7 = 1"))
      .select("doc_id").as[Long]
      .mapPartitions(_.map(MultimodalQueries.renderVideoAsset))
    val fhr = Multimodal.videoFrameHashes(media, everyNth = 1).localCheckpoint(true)
    val indexPairs = Dedup.hammingPairs(Multimodal.videoHashes64(fhr), maxDist = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exactPairs = Multimodal.nearDupVideoPairsFromHashes(fhr, maxDist = 10,
        minFrameFrac = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(indexPairs === exactPairs)
    assert(indexPairs.nonEmpty)
  }

  test("q113 rendered-corpus video near-dup: pairs == same-group pairs, partial matches rejected") {
    import graft.queries.MultimodalQueries
    // the margin the oracle's exactness rests on: min pairwise Hamming
    // distance over the FULL 28-pattern frame family (4 shared frame-0
    // patterns + 24 per-group frame patterns) far above maxDist 10
    val idxs = (0L until 8L).flatMap(g => Seq(1000L + g / 2) ++ (1 to 3).map(k => g * 4 + k)).distinct
    val pats = idxs.map(MultimodalQueries.groupPattern)
    val minD = (for (i <- pats.indices; j <- i + 1 until pats.length)
      yield hamming(pats(i), pats(j))).min
    assert(minD >= 20, s"frame patterns too close: $minD")
    val dir = sf("sf0.001")
    val got = MultimodalQueries.defs("q113_video_neardup")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    val sel = Tables(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.expr("doc_id % 7 = 1 AND doc_id % 13 <> 5"))
      .select("doc_id").as[Long].collect().sorted
    val want = (for {
      i <- sel.indices; j <- i + 1 until sel.length
      if sel(i) % 8 == sel(j) % 8
    } yield (sel(i), sel(j), 4L)).toSet
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
    // partial-match rejection is load-bearing: the two groups of a
    // super-group DO match on frame 0 — drop the majority rule to a
    // 1-frame threshold and those cross-group pairs must appear.
    val media = Tables(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.expr("doc_id % 7 = 1"))
      .select("doc_id").as[Long]
      .mapPartitions(_.map(MultimodalQueries.renderVideoAsset))
    val loose = Multimodal.nearDupVideoPairs(media, maxDist = 10, everyNth = 1,
        minFrameFrac = 0.25)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val superPairs = (for {
      i <- sel.indices; j <- i + 1 until sel.length
      if sel(i) % 8 / 2 == sel(j) % 8 / 2
    } yield (sel(i), sel(j))).toSet
    assert(loose === superPairs,
      s"missing=${(superPairs -- loose).take(5)} extra=${(loose -- superPairs).take(5)}")
    assert(superPairs.size > want.size)
  }

  test("q101 rendered-corpus image near-dup: pairs == same-group decodable pairs") {
    import graft.queries.MultimodalQueries
    // the pattern family's separation margin the oracle's exactness
    // rests on: min pairwise Hamming distance 25 >> maxDist 10
    val pats = (0L until 8L).map(MultimodalQueries.groupPattern)
    val minD = (for (i <- 0 until 8; j <- i + 1 until 8)
      yield hamming(pats(i), pats(j))).min
    assert(minD >= 20, s"group patterns too close: $minD")
    val dir = sf("sf0.001")
    val got = MultimodalQueries.defs("q101_image_neardup")(spark, dir)
      .as[(Long, Long)].collect().toSet
    val sel = Tables(spark, dir, "documents")
      .where(org.apache.spark.sql.functions.expr("doc_id % 7 = 3 AND doc_id % 13 <> 5"))
      .select("doc_id").as[Long].collect().sorted
    val want = (for {
      i <- sel.indices; j <- i + 1 until sel.length
      if sel(i) % 8 == sel(j) % 8
    } yield (sel(i), sel(j))).toSet
    assert(got === want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty)
  }

  test("interleaveByAffinity: argmax assignment, affinity-ordered sequences, unassigned chunks absent") {
    import org.apache.spark.sql.functions._
    // 2D embeddings make affinities readable: chunks on the axes,
    // images at angles between them
    val chunks = Seq(
      (0L, Array(1.0f, 0.0f)),   // "x" chunk
      (1L, Array(0.0f, 1.0f)),   // "y" chunk
      (2L, Array(-1.0f, 0.0f)))  // nothing assigns here
      .toDF("vec_id", "embedding")
    val images = Seq(
      (10L, Array(0.9f, 0.1f)),  // → chunk 0, strongest
      (11L, Array(0.6f, 0.4f)),  // → chunk 0, weaker
      (12L, Array(0.1f, 0.9f))   // → chunk 1
    ).toDF("vec_id", "embedding")
    val got = Multimodal.interleaveByAffinity(
        chunks, images, "embedding", "vec_id", "vec_id")
      .orderBy("chunk_id")
      .select("chunk_id", "n_images", "img_seq")
      .as[(Long, Long, String)].collect().toSeq
    assert(got === Seq((0L, 2L, "10,11"), (1L, 1L, "12")))
    // ties on cosine order by image id: two images at the same angle
    val tied = Seq((20L, Array(1.0f, 1.0f)), (21L, Array(2.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val seq = Multimodal.interleaveByAffinity(
        chunks, tied, "embedding", "vec_id", "vec_id")
      .where(col("chunk_id") === 0L).select("img_seq").as[String].head()
    assert(seq === "20,21")
  }
}
