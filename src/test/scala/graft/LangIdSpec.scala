package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{LangIdExpr, LangIdKernel, LangIdModel}
import graft.operators.LangId

/** [[LangId]] / [[LangIdExpr]]: correct argmax on held-out text per
  * language, unknown-script and short-text fallback, mixed-text margin
  * compression, model determinism, codegen execution.
  */
class LangIdSpec extends SparkSuite {
  import spark.implicits._

  // held-out sentences (NOT in the seed corpus) — generalization, not recall
  private val heldOut = Seq(
    "en" -> "she opened the letter and read the news about the school while drinking her morning coffee",
    "de" -> "sie öffnete den brief und las die nachrichten über die schule während sie ihren morgenkaffee trank",
    "fr" -> "elle ouvrit la lettre et lut les nouvelles au sujet de la petite école en buvant son café du matin",
    "es" -> "ella abrió la carta y leyó las noticias sobre la escuela mientras tomaba su café de la mañana",
    "it" -> "lei aprì la lettera e lesse le notizie sulla scuola mentre beveva il suo caffè del mattino",
    "pt" -> "ela abriu a carta e leu as notícias sobre a escola enquanto tomava o seu café da manhã")

  private def score(s: String): (String, Double, Double, Int) = {
    val r = LangIdKernel.eval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (r.getUTF8String(0).toString, r.getDouble(1), r.getDouble(2), r.getInt(3))
  }

  test("held-out sentences classify to their language with positive margin") {
    for ((lang, txt) <- heldOut) {
      val (got, avg, margin, n) = score(txt)
      assert(got === lang, s"$lang: $txt -> $got (avg=$avg margin=$margin)")
      assert(margin > 0.0, s"$lang margin")
      assert(avg > -7.5, s"$lang avg_lp=$avg must clear the classify floor")
      assert(n === txt.length - 2)
    }
  }

  test("unknown script sinks to the OOV floor; gibberish scores far below real text") {
    val ru = "все счастливые семьи похожи друг на друга каждая несчастливая семья несчастлива по своему"
    val (_, avg, _, _) = score(ru)
    assert(avg < -7.5, s"cyrillic avg_lp=$avg must fall below the classify floor")
    // every language sees only OOV trigrams → avg == that language's OOV rate
    val m = LangIdModel.model
    assert(m.oov.exists(o => math.abs(avg - o) < 1e-12))
  }

  test("classify: per-language calls, und fallbacks (short, unknown-script, null)") {
    val rows = heldOut.map { case (l, t) => (l, t) } ++ Seq(
      ("und_short", "ab"),
      ("und_script", "все счастливые семьи похожи друг на друга каждая несчастливая"),
      ("und_null", null.asInstanceOf[String]))
    val byWant = LangId.classify(rows.toDF("want", "text"), "text")
      .select("want", "lang", "lang_conf").collect()
      .map { case Row(w: String, l: String, c: Double) => (w, (l, c)) }.toMap
    for ((lang, _) <- heldOut) assert(byWant(lang)._1 === lang)
    assert(byWant("und_short")._1 === "und")
    assert(byWant("und_short")._2 === 0.0)
    assert(byWant("und_script")._1 === "und")
    assert(byWant("und_null")._1 === "und")
    assert(byWant("und_null")._2 === 0.0)
  }

  test("mixed bilingual text compresses the margin vs pure text") {
    val pureEn = heldOut.toMap.apply("en")
    val pureFr = heldOut.toMap.apply("fr")
    val (_, _, mPure, _) = score(pureEn)
    val (langMix, _, mMix, _) = score(pureEn + " " + pureFr)
    assert(Set("en", "fr").contains(langMix))
    assert(mMix < mPure, s"mixed margin $mMix !< pure margin $mPure")
  }

  test("model is deterministic and langs are the sorted tie-break order") {
    val a = LangIdModel.train(LangIdModel.seeds)
    val b = LangIdModel.train(LangIdModel.seeds)
    assert(a.langs.toSeq === b.langs.toSeq)
    assert(a.langs.toSeq === a.langs.toSeq.sorted)
    assert(a.oov.toSeq === b.oov.toSeq)
    for (i <- a.langs.indices) assert(a.logp(i) === b.logp(i))
    // OOV floor is where the spec + operator docs say it is
    assert(a.oov.forall(o => o < -7.0 && o > -8.5), a.oov.toSeq.toString)
  }

  test("classify runs unchanged on a stream (stateless map-side expression)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = LangId.classify(in.toDF().toDF("id", "text"), "text")
      .select("id", "lang")
    val q = out.writeStream.format("memory").queryName("langid_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, heldOut.toMap.apply("de")), (2L, heldOut.toMap.apply("pt")),
        (3L, "ab"))
      q.processAllAvailable()
      assert(spark.table("langid_stream").as[(Long, String)].collect().toSet ===
        Set((1L, "de"), (2L, "pt"), (3L, "und")))
    } finally q.stop()
  }

  test("expression runs inside whole-stage codegen; scores are plan-stable") {
    val df = spark.range(4)
      .select(concat(lit("the quick brown fox jumps over the lazy dog number "),
        col("id").cast("string")).as("t"))
      .select(LangIdExpr.langid(col("t")).as("r"))
      .select(col("r.lang").as("lang"), round(col("r.avg_lp"), 6).as("avg"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    val rows = df.collect()
    assert(rows.forall(_.getString(0) == "en"))
  }
}
