package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import graft.functions.{TextRepairExpr, TextRepairKernel}

class TextRepairSpec extends SparkSuite {
  import spark.implicits._

  private def damageLatin1(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), StandardCharsets.ISO_8859_1)

  private def damageCp1252(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), "windows-1252")

  private def fix(s: String): String =
    TextRepairKernel.fix(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      .toString

  test("fix inverts Latin-1 AND CP1252 mojibake, including the CP1252-special bytes") {
    // '—' (U+2014) has UTF-8 bytes E2 80 94: byte 0x80 decodes to U+20AC
    // ('€') under CP1252 and U+0080 under Latin-1 — the sloppy inverse
    // must unwind both
    val originals = Seq("café", "naïve — résumé", "€99 • „quote“", "ўжо №5")
    for (o <- originals) {
      assert(fix(damageLatin1(o)) === o, s"latin1: $o")
      assert(fix(damageCp1252(o)) === o, s"cp1252: $o")
    }
  }

  test("double-mojibake (damaged twice) unwinds fully") {
    // Latin-1 is lossless so any string survives two rounds; strict
    // CP1252 damage DESTROYS bytes landing on its five holes (Java
    // decodes 0x81/0x8D/0x8F/0x90/0x9D to U+FFFD — '—' hits 0x9D in
    // round two), so the CP1252 leg uses a hole-free string: no
    // repairer can undo information loss
    assert(fix(damageLatin1(damageLatin1("café — über"))) === "café — über")
    assert(fix(damageCp1252(damageCp1252("café über"))) === "café über")
  }

  test("no false repairs: ASCII, genuine accents, CJK, emoji pass through untouched") {
    for (s <- Seq("plain ascii only", "café résumé — real text",
        "中文文本不是乱码", "emoji 🎉 stays", "", "§±°µ·"))
      assert(fix(s) === s, s)
  }

  test("mixed mojibake + unmappable script passes through untouched") {
    // "cafÃ©" alone would repair, but the CJK/emoji tail has no CP1252
    // byte, which is evidence of NO damage — the whole string must
    // survive verbatim. Regression: a Scala-Int-valued inverse map
    // unboxed a missing key's null to 0, mapping these chars to byte
    // 0x00 and destroying them.
    for (s <- Seq("cafÃ© 中文", "naÃ¯ve 🎉", "Ã© кириллица", "cafÃ©中"))
      assert(fix(s) === s, s)
    assert(TextRepairKernel.repairOnce("cafÃ© 中文") === null)
  }

  test("invalid byte sequences do not repair (mapping back must yield strict UTF-8)") {
    // 'Ã' alone maps to byte 0xC3 — a dangling UTF-8 lead byte
    assert(fix("Ã") === "Ã")
    assert(fix("abcÿ") === "abcÿ") // 0xFF is never valid in UTF-8
  }

  test("expression runs inside whole-stage codegen over a damaged column") {
    val df = spark.range(2)
      .select(concat(lit(damageLatin1("id café ")), col("id").cast("string"))
        .as("dmg"))
      .select(TextRepairExpr.fixMojibake(col("dmg")).as("rep"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(df.orderBy("rep").as[String].collect().toSeq ===
      Seq("id café 0", "id café 1"))
  }
}
