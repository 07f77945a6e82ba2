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
    "pt" -> "ela abriu a carta e leu as notícias sobre a escola enquanto tomava o seu café da manhã",
    "ru" -> "она открыла письмо и прочитала новости о школе пока пила свой утренний кофе",
    "zh" -> "她打开信读了关于学校的消息一边喝着早晨的咖啡",
    "ja" -> "彼女は手紙をあけて朝のコーヒーを飲みながら学校についての知らせを読んだ",
    "ko" -> "그녀는 편지를 열고 아침 커피를 마시면서 학교에 관한 소식을 읽었다",
    "ar" -> "فتحت الرسالة وقرات الاخبار عن المدرسة بينما كانت تشرب قهوة الصباح",
    "el" -> "άνοιξε το γράμμα και διάβασε τα νέα για το σχολείο ενώ έπινε τον πρωινό της καφέ",
    "hi" -> "उसने पत्र खोला और अपनी सुबह की कॉफी पीते हुए स्कूल के बारे में समाचार पढ़ा",
    "th" -> "เธอเปิดจดหมายและอ่านข่าวเกี่ยวกับโรงเรียนขณะดื่มกาแฟยามเช้าของเธอ",
    "he" -> "היא פתחה את המכתב וקראה את החדשות על בית הספר בזמן ששתתה את קפה הבוקר שלה",
    "fa" -> "او نامه را باز کرد و در حالی که قهوه صبح خود را می نوشید خبرهای مدرسه را خواند",
    "tr" -> "mektubu açtı ve sabah kahvesini içerken okul hakkındaki haberleri okudu",
    "bn" -> "সে চিঠিটা খুলল আর সকালের কফি খেতে খেতে স্কুলের খবর পড়ল",
    "ta" -> "அவள் கடிதத்தைத் திறந்து காலை காபி குடித்தபடி பள்ளியைப் பற்றிய செய்திகளைப் படித்தாள்",
    "te" -> "ఆమె ఉత్తరం తెరిచి ఉదయం కాఫీ తాగుతూ బడి గురించి వార్తలు చదివింది")

  private val minGap = graft.operators.LangId.DefaultMinOovGap
  // unknown-script probes: Georgian and Armenian are not model languages
  // (Thai and Hebrew graduated in r16) — every LETTER-bearing gram is
  // OOV, so the gap is exactly 0
  private val georgian =
    "ყველა ბედნიერი ოჯახი ერთმანეთს ჰგავს ყოველი უბედური ოჯახი კი თავისებურად არის უბედური"
  private val armenian =
    "բոլոր երջանիկ ընտանիքները նման են իրար ամեն դժբախտ ընտանիք դժբախտ է յուրովի"

  private def score(s: String): (String, Double, Double, Double, Int) = {
    val r = LangIdKernel.eval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    (r.getUTF8String(0).toString, r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getInt(4))
  }

  test("held-out sentences classify to their language with positive margin and gap") {
    for ((lang, txt) <- heldOut) {
      val (got, avg, margin, gap, n) = score(txt)
      assert(got === lang, s"$lang: $txt -> $got (avg=$avg margin=$margin)")
      assert(margin > 0.0, s"$lang margin")
      assert(gap > minGap * 2,
        s"$lang oov_gap=$gap must clear the classify floor $minGap with room")
      assert(math.abs(gap - (avg - LangIdModel.model.oov(
        LangIdModel.model.langs.indexOf(got)))) < 1e-12)
      assert(n === txt.codePointCount(0, txt.length) - 2)
    }
  }

  test("unknown scripts have an OOV gap of exactly zero") {
    for (probe <- Seq(georgian, armenian, georgian + " #123 456")) {
      val (_, avg, _, gap, _) = score(probe)
      // every language sees only OOV grams (spaces/digits carry no
      // letter and never score) → avg == the argmax language's OOV rate
      // and the gap is 0 (up to the float noise of sum(n copies of
      // oov)/n) — the property the und rule keys on (self-calibrating:
      // no absolute floor to tune)
      assert(math.abs(gap) < 1e-9, s"probe gap=$gap avg=$avg")
      assert(LangIdModel.model.oov.exists(o => math.abs(avg - o) < 1e-9))
    }
  }

  test("digit/punctuation-only text carries no evidence: und with zeroed scores") {
    for (probe <- Seq("123 456 789 000", "#### ---- ....", "🙂🙂 🙂🙂🙂"))
      assert(score(probe) === ("und", 0.0, 0.0, 0.0,
        probe.codePointCount(0, probe.length) - 2), probe)
  }

  test("supplementary-plane codepoints window whole (no surrogate-split grams)") {
    // 4 emoji = 8 UTF-16 units but 4 codepoints: n_tri must be 2, and
    // mixing emoji into real text must not shift the language call
    val (_, _, _, _, n) = score("🙂🙂🙂🙂")
    assert(n === 2)
    val en = heldOut.toMap.apply("en")
    val (lang, _, _, gapPlain, _) = score(en)
    val (langEmoji, _, _, gapEmoji, _) = score(en + " 🙂🙂")
    assert(lang === "en" && langEmoji === "en")
    // emoji grams are letter-free and unscored; the pure-emoji tail only
    // grows nothing — gap moves marginally via the mixed boundary grams
    assert(math.abs(gapEmoji - gapPlain) < 0.2, s"$gapPlain vs $gapEmoji")
  }

  test("classify: per-language calls, und fallbacks (short, unknown-script, null)") {
    val rows = heldOut.map { case (l, t) => (l, t) } ++ Seq(
      ("und_short", "ab"),
      ("und_script", georgian),
      ("und_armenian", armenian),
      ("und_null", null.asInstanceOf[String]))
    val byWant = LangId.classify(rows.toDF("want", "text"), "text")
      .select("want", "lang", "lang_conf").collect()
      .map { case Row(w: String, l: String, c: Double) => (w, (l, c)) }.toMap
    for ((lang, _) <- heldOut) assert(byWant(lang)._1 === lang)
    assert(byWant("und_short")._1 === "und")
    assert(byWant("und_short")._2 === 0.0)
    assert(byWant("und_script")._1 === "und")
    assert(byWant("und_armenian")._1 === "und")
    assert(byWant("und_null")._1 === "und")
    assert(byWant("und_null")._2 === 0.0)
  }

  test("mixed bilingual text compresses the margin vs pure text") {
    val pureEn = heldOut.toMap.apply("en")
    val pureFr = heldOut.toMap.apply("fr")
    val (_, _, mPure, _, _) = score(pureEn)
    val (langMix, _, mMix, _, _) = score(pureEn + " " + pureFr)
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
    // OOV rates are sane model minima (pure-OOV text gaps to exactly 0
    // and can never pass the und rule, whatever these absolute values)
    assert(a.oov.forall(o => o < -7.0 && o > -11.0), a.oov.toSeq.toString)
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
