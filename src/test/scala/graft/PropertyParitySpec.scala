package graft

import org.scalacheck.{Gen, rng}

import graft.operators.{Dedup, EditSimilarity}

/** Randomized (seeded, reproducible) brute-force parity for the two
  * blocking-based pair machineries: the pigeonhole constructions promise
  * FULL recall at their bounds, so on any input the blocked result must
  * EQUAL the quadratic scan — not just on hand-picked fixtures.
  */
class PropertyParitySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, rng.Seed(seed)).get

  test("hammingPairs == brute force on random signatures, adversarial distance bounds") {
    // distances chosen to cross every chunk-width regime, including the
    // values the pre-round-10 ceil-width scheme broke (11, 16, 23, 45)
    val bounds = Seq(1, 5, 11, 16, 23, 31, 45)
    for ((maxDist, round) <- bounds.zipWithIndex) {
      val n = 48
      val base = sample(Gen.listOfN(n, Gen.long), 7000L + round)
      // plant mutated copies at exactly the bound: flip maxDist distinct
      // bit positions of the first few signatures
      val positions = sample(Gen.listOfN(maxDist.max(1), Gen.choose(0, 63)), 8100L + round)
        .distinct
      val planted = base.take(4).map(s => positions.foldLeft(s)((a, b) => a ^ (1L << b)))
      val sigs = (base ++ planted).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Dedup.hammingPairs(sigs.toDF("id", "sig"), maxDist)
        .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
      val want = (for {
        i <- sigs.indices; j <- i + 1 until sigs.length
        d = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) if d <= maxDist
      } yield (sigs(i)._1, sigs(j)._1, d)).toSet
      assert(got === want, s"maxDist=$maxDist: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    }
  }

  test("exact Jaccard routes == brute force on random small-vocab corpora") {
    // tiny vocabulary makes shared shingles dense — the regime where the
    // AllPairs prefix bound and the inverted-index route must still be
    // COMPLETE, including the <=n-token whole-text-shingle degenerate
    // docs and blank docs
    def shingles(s: String, n: Int): Set[String] = {
      val t = s.trim
      if (t.isEmpty) Set.empty
      else {
        val w = t.split("\\s+").toSeq
        if (w.length <= n) Set(w.mkString(" "))
        else w.sliding(n).map(_.mkString(" ")).toSet
      }
    }
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val docGen = Gen.choose(0, 10).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
    for ((threshold, round) <- Seq(0.3, 0.5, 0.75).zipWithIndex) {
      val docs = sample(Gen.listOfN(40, docGen), 4400L + round)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = docs.toDF("doc_id", "text")
      def pairs(r: org.apache.spark.sql.DataFrame) =
        r.select("id_a", "id_b", "jaccard").collect()
          .map(x => (x.getLong(0), x.getLong(1),
            math.rint(x.getDouble(2) * 1e9) / 1e9)).toSet
      val inv = pairs(Dedup.ngramJaccardPairs(df, "text", "doc_id", n = 3,
        threshold = threshold))
      val pre = pairs(Dedup.ngramJaccardPrefixFiltered(df, "text", "doc_id",
        n = 3, threshold = threshold))
      val want = (for {
        i <- docs.indices; j <- i + 1 until docs.length
        sa = shingles(docs(i)._2, 3); sb = shingles(docs(j)._2, 3)
        if sa.nonEmpty && sb.nonEmpty
        jac = (sa & sb).size.toDouble / (sa | sb).size
        if jac >= threshold && (sa & sb).nonEmpty
      } yield (docs(i)._1, docs(j)._1, math.rint(jac * 1e9) / 1e9)).toSet
      def dump(ps: Set[(Long, Long, Double)]) = ps.take(3).map { case (a, b, j) =>
        s"($a='${docs(a.toInt)._2}', $b='${docs(b.toInt)._2}', $j)"
      }
      assert(inv === want, s"inverted t=$threshold: " +
        s"missing=${dump(want -- inv)} extra=${dump(inv -- want)}")
      assert(pre === want, s"prefix t=$threshold: " +
        s"missing=${(want -- pre).take(3)} extra=${(pre -- want).take(3)}")
    }
  }

  test("containmentPairs == brute subset scan on random small-vocab corpora") {
    def shingles(s: String, n: Int): Set[String] = {
      val t = s.trim
      if (t.isEmpty) Set.empty
      else {
        val w = t.split("\\s+").toSeq
        if (w.length <= n) Set(w.mkString(" "))
        else w.sliding(n).map(_.mkString(" ")).toSet
      }
    }
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = Gen.choose(0, 9).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
    for (round <- 0 until 3) {
      val docs = sample(Gen.listOfN(35, docGen), 5500L + round)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Dedup.containmentPairs(docs.toDF("doc_id", "text"),
          "text", "doc_id", n = 3)
        .select("id_a", "id_b", "n_common").as[(Long, Long, Long)]
        .collect().toSet
      val want = (for {
        i <- docs.indices; j <- docs.indices if i != j
        sa = shingles(docs(i)._2, 3); sb = shingles(docs(j)._2, 3)
        if sa.nonEmpty && sb.nonEmpty && sa.subsetOf(sb)
      } yield (docs(i)._1, docs(j)._1, sa.size.toLong)).toSet
      assert(got === want, s"round $round: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    }
  }

  test("token-cosine dense and prefix routes == brute force on random corpora") {
    def vec(s: String): Map[String, Int] =
      if (s.trim.isEmpty) Map.empty
      else s.trim.split("\\s+").toSeq.groupBy(identity).map { case (k, v) => k -> v.size }
    def cosine(a: Map[String, Int], b: Map[String, Int]): Double = {
      // keys.toSeq: mapping a SET to products would collapse equal values
      val dot = a.keys.toSeq.filter(b.contains).map(k => a(k).toDouble * b(k)).sum
      val na = math.sqrt(a.values.map(v => v.toDouble * v).sum)
      val nb = math.sqrt(b.values.map(v => v.toDouble * v).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
    val docGen = Gen.choose(1, 8).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" ")))
    for ((threshold, round) <- Seq(0.4, 0.8).zipWithIndex) {
      val docs = sample(Gen.listOfN(30, docGen), 6600L + round)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = docs.toDF("doc_id", "text")
      def pairs(r: org.apache.spark.sql.DataFrame) =
        r.select("id_a", "id_b", "cosine").collect()
          .map(x => (x.getLong(0), x.getLong(1),
            math.rint(x.getDouble(2) * 1e9) / 1e9)).toSet
      val want = (for {
        i <- docs.indices; j <- i + 1 until docs.length
        c = cosine(vec(docs(i)._2), vec(docs(j)._2))
        if c >= threshold && c > 0
      } yield (docs(i)._1, docs(j)._1, math.rint(c * 1e9) / 1e9)).toSet
      val naive = pairs(graft.operators.Similarity.tokenCosinePairs(
        df, "text", "doc_id", threshold))
      val routed = pairs(graft.operators.Similarity.tokenCosinePairsPrefix(
        df, "text", "doc_id", threshold))
      assert(naive === want, s"naive t=$threshold: " +
        s"missing=${(want -- naive).take(3)} extra=${(naive -- want).take(3)}")
      assert(routed === want, s"routed t=$threshold: " +
        s"missing=${(want -- routed).take(3)} extra=${(routed -- want).take(3)}")
    }
  }

  test("distributed prefix sum == global window on random skewed frames") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val lenGen: Gen[Long] =
      Gen.oneOf(Gen.choose(0L, 5L), Gen.choose(1000L, 100000L))
    val rowGen: Gen[(Long, Long)] = for {
      id <- Gen.choose(0L, 100000L)
      len <- lenGen
    } yield (id, len)
    for (round <- 0 until 3) {
      val rows = sample(Gen.listOfN(300, rowGen), 3300L + round)
        .distinctBy(_._1)
      val df = rows.toDF("id", "len").repartition(2 + round * 5)
      val dist = graft.operators.Packing.withPrefixSum(df, "id", "len")
        .select("id", "start_token").as[(Long, Long)].collect().toMap
      val naive = df.select(col("id"),
          coalesce(sum("len").over(Window.orderBy("id")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("s"))
        .as[(Long, Long)].collect().toMap
      assert(dist === naive, s"round $round")
    }
  }

  test("editDistanceSelfJoin == brute force on random small-alphabet strings") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // tiny alphabet forces dense collisions: empty strings, equal strings,
    // and every edit type occur organically
    val strGen = Gen.choose(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for ((tau, round) <- Seq(1, 2, 3).zipWithIndex) {
      val strs = sample(Gen.listOfN(40, strGen), 9200L + round)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = EditSimilarity
        .editDistanceSelfJoin(strs.toDF("id", "s"), "s", "id", tau)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        i <- strs.indices; j <- i + 1 until strs.length
        d = lev(strs(i)._2, strs(j)._2) if d <= tau
      } yield (strs(i)._1, strs(j)._1, d.toLong)).toSet
      assert(got === want, s"tau=$tau: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, s"tau=$tau generated no qualifying pairs")
    }
  }

  test("editDistancePairsBetween == directed brute force on random small-alphabet strings") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val strGen = Gen.choose(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for ((tau, round) <- Seq(1, 2, 3).zipWithIndex) {
      val left = sample(Gen.listOfN(25, strGen), 9700L + round)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val right = sample(Gen.listOfN(25, strGen), 9800L + round)
        .zipWithIndex.map { case (s, i) => (100L + i, s) }
      val got = EditSimilarity
        .editDistancePairsBetween(left.toDF("id", "s"), right.toDF("id", "s"),
          "s", "id", tau)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        l <- left; r <- right
        d = lev(l._2, r._2) if d <= tau
      } yield (l._1, r._1, d.toLong)).toSet
      assert(got === want, s"tau=$tau: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
      assert(want.nonEmpty, s"tau=$tau generated no qualifying cross pairs")
    }
  }

  test("hammingPairsBy == per-key brute force on random signatures with planted cross-key twins") {
    for ((maxDist, round) <- Seq(3, 10, 16).zipWithIndex) {
      val n = 40
      val base = sample(Gen.listOfN(n, Gen.long), 7300L + round)
      val keys = sample(Gen.listOfN(n, Gen.choose(0, 3)), 7400L + round)
      // plant identical signatures under DIFFERENT keys: blocked by key,
      // they must never pair
      val rows = base.zip(keys).zipWithIndex.map { case ((s, k), i) => (i.toLong, k, s) } ++
        Seq((1000L, 0, base.head), (1001L, 1, base.head))
      val got = Dedup.hammingPairsBy(rows.toDF("id", "key", "sig"), "key", maxDist)
        .select("key", "id_a", "id_b", "hamming")
        .as[(Int, Long, Long, Int)].collect().toSet
      val want = (for {
        i <- rows.indices; j <- i + 1 until rows.length
        if rows(i)._2 == rows(j)._2
        d = java.lang.Long.bitCount(rows(i)._3 ^ rows(j)._3) if d <= maxDist
        lo = math.min(rows(i)._1, rows(j)._1); hi = math.max(rows(i)._1, rows(j)._1)
      } yield (rows(i)._2, lo, hi, d)).toSet
      assert(got === want, s"maxDist=$maxDist: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
      assert(!got.exists { case (_, a, b, _) => a == 1000L && b == 1001L },
        "identical signatures under different keys must not pair")
    }
  }

  test("WARC render -> parse round-trips arbitrary payloads, including embedded magic and CRLF runs") {
    import graft.sources.Warc
    // adversarial alphabet: payload bytes drawn from fragments that
    // include the record magic, header-terminator runs, and raw bytes
    val fragGen = Gen.oneOf(
      Gen.const("WARC/1.0\r\n".getBytes("UTF-8")),
      Gen.const("\r\n\r\n".getBytes("UTF-8")),
      Gen.const("Content-Length: 7\r\n".getBytes("UTF-8")),
      Gen.listOfN(5, Gen.choose(0, 255)).map(_.map(_.toByte).toArray))
    for (round <- 0 until 3) {
      val payloads = sample(Gen.listOfN(12,
        Gen.choose(0, 6).flatMap(k => Gen.listOfN(k, fragGen).map(_.flatten.toArray))),
        6400L + round)
      val blob = payloads.zipWithIndex.foldLeft(Array.emptyByteArray) {
        case (acc, (p, i)) => acc ++ Warc.render("response", s"<urn:p:$i>", s"u$i", p)
      }
      val rs = Warc.parseAll(blob)
      assert(rs.length === payloads.length, s"round=$round")
      assert(rs.forall(_.valid))
      assert(rs.map(_.record_id) === payloads.indices.map(i => s"<urn:p:$i>"))
      rs.zip(payloads).foreach { case (r, p) =>
        assert(r.content_length === p.length.toLong)
        assert(r.payload.toSeq === p.toSeq)
      }
    }
  }

  test("mixtureAllocation == local closed form on random availabilities and weights") {
    import graft.operators.Sampling
    for (round <- 0 until 3) {
      val strata = ('a' to 'f').map(_.toString)
      val avails = sample(Gen.listOfN(strata.length, Gen.choose(0L, 5000L)), 5500L + round)
      val raw = sample(Gen.listOfN(strata.length, Gen.choose(1, 9)), 5600L + round)
      val wsum = raw.sum.toDouble
      val weights = strata.zip(raw.map(_ / wsum)).toMap
      val budget = sample(Gen.choose(100L, 20000L), 5700L + round)
      // drop one stratum from avail every other round (the infeasible path)
      val presentN = if (round % 2 == 0) strata.length else strata.length - 1
      val avail = strata.take(presentN).zip(avails)
        .toDF("stratum", "n_tokens")
      val got = Sampling.mixtureAllocation(avail, "stratum", "n_tokens",
          weights, budget)
        .select("stratum", "n_avail", "n_take")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val availMap = strata.take(presentN).zip(avails).toMap.withDefaultValue(0L)
      val tStar = math.min(budget.toDouble,
        strata.map(s => availMap(s).toDouble / weights(s)).min)
      val want = strata.map(s =>
        s -> ((availMap(s), math.floor(weights(s) * tStar).toLong))).toMap
      assert(got === want, s"round=$round budget=$budget")
      assert(got.values.forall { case (av, take) => take <= av })
    }
  }

  test("Bm25.topK == local brute-force scoring on random small-vocab corpora") {
    val vocab = Seq("a", "b", "c", "d", "e", "f")
    for (round <- 0 until 4) {
      val nDocs = 5 + round * 4
      val docs = (1L to nDocs.toLong).map { id =>
        val len = sample(Gen.choose(0, 8), 9500L + round * 100 + id)
        val words = sample(Gen.listOfN(len, Gen.oneOf(vocab)), 9600L + round * 100 + id)
        (id, words.mkString(" "))
      }
      val queries = (100L to 102L).map { qid =>
        val words = sample(Gen.listOfN(3, Gen.oneOf(vocab)), 9700L + round * 10 + qid)
        (qid, words.mkString(" "))
      }
      val k = 4
      val got = graft.operators.Bm25.topK(docs.toDF("doc_id", "text"),
          queries.toDF("qid", "q"), "doc_id", "text", "qid", "q", k)
        .select("query_id", "doc_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
      // local reference: same formula, rounded before ranking
      val tf = docs.flatMap { case (id, t) =>
        t.trim.split("\\s+").filter(_.nonEmpty).groupBy(identity)
          .map { case (w, g) => (id, w, g.length.toLong) }
      }
      val dl = tf.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val n = dl.size.toDouble
      val avgdl = dl.values.sum.toDouble / n
      val dfm = tf.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = queries.flatMap { case (qid, q) =>
        val terms = q.trim.split("\\s+").filter(_.nonEmpty).distinct
        val scores = dl.keys.toSeq.map { id =>
          val s = terms.map { t =>
            val f = tf.find(x => x._1 == id && x._2 == t).map(_._3.toDouble).getOrElse(0.0)
            if (f == 0) 0.0
            else math.log(1 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
              f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
          }.sum
          (id, r6(s))
        }.filter(_._2 != 0.0)
        scores.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
          .map { case ((id, s), i) => (qid, id, s, i + 1) }
      }.toSet
      assert(got === want, s"round=$round: missing=${(want -- got).take(3)} " +
        s"extra=${(got -- want).take(3)}")
    }
  }

  test("slidingWindows == local window arithmetic on random docs") {
    for (round <- 0 until 3) {
      val window = 2 + round * 2
      val stride = 1 + round
      val docs = (1L to 12L).map { id =>
        val len = sample(Gen.choose(0, 11), 9900L + round * 20 + id)
        (id, (1 to len).map(i => s"w${(i * id) % 7}").mkString(" "))
      }
      val got = graft.operators.Packing.slidingWindows(
          docs.toDF("doc_id", "text"), "text", "doc_id", window, stride)
        .select("doc_id", "chunk_idx", "start_token", "n_tokens", "chunk_text")
        .as[(Long, Long, Long, Long, String)].collect().toSet
      val want = docs.flatMap { case (id, t) =>
        val toks = t.trim.split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) Seq.empty
        else (0 to (toks.length - 1) / stride).map { i =>
          val chunk = toks.slice(i * stride, i * stride + window)
          (id, i.toLong, (i * stride).toLong, chunk.length.toLong,
            chunk.mkString(" "))
        }
      }.toSet
      assert(got === want, s"round=$round window=$window stride=$stride")
    }
  }
}
