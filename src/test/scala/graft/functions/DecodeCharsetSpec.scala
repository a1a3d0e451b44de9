package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class DecodeCharsetSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def dec(bytes: Array[Byte], cs: String): String =
    Seq((bytes, cs)).toDF("b", "c")
      .select(Html.decodeBytes(col("b"), col("c"))).head.getString(0)

  private val cp1251Privet =
    Array(0xCF, 0xF0, 0xE8, 0xE2, 0xE5, 0xF2).map(_.toByte) // Привет

  test("decodeBytes: per-row charsets — utf-8, windows-1251, iso-8859-1") {
    assert(dec("naïve ✓".getBytes("UTF-8"), "utf-8") == "naïve ✓")
    assert(dec(cp1251Privet, "windows-1251") == "Привет")
    assert(dec("café".getBytes("ISO-8859-1"), "ISO-8859-1") == "café")
    assert(dec("tokyo".getBytes("UTF-8"), "Shift_JIS") == "tokyo") // ascii subset
  }

  test("decodeBytes: 7-bit STATEFUL encodings must not take the ASCII fast path") {
    // ISO-2022-JP is 7-bit BY DESIGN (every byte incl. ESC is < 0x80)
    // yet does not decode to itself — a name-blacklist fast path
    // silently corrupted it (round-15 review catch); the whitelist must
    // route it through the real decoder
    val jis = "こんにちは".getBytes("ISO-2022-JP")
    assert(jis.forall(_ >= 0), "fixture must be 7-bit to exercise the path")
    assert(dec(jis, "iso-2022-jp") == "こんにちは")
    assert(dec("plain".getBytes("ISO-2022-JP"), "iso-2022-jp") == "plain")
  }

  test("decodeBytes: unknown/empty/null charset takes the WHATWG fallback") {
    // valid UTF-8 content decodes as UTF-8 whatever the bogus name says
    assert(dec("fallback ü".getBytes("UTF-8"), "x-total-garbage") == "fallback ü")
    assert(dec("fallback".getBytes("UTF-8"), "") == "fallback")
    assert(dec("fallback".getBytes("UTF-8"), "   ") == "fallback")
    assert(dec("illegal name".getBytes("UTF-8"), "not a charset!!") == "illegal name")
    val viaNull = Seq(Tuple1("x".getBytes("UTF-8"))).toDF("b")
      .select(Html.decodeBytes(col("b"), lit(null).cast("string")))
      .head.getString(0)
    assert(viaNull == "x")
    // NON-UTF-8 content with no usable declaration reads as windows-1252
    // (the browser behavior: readable mojibake, not U+FFFD soup)
    assert(dec(cp1251Privet, "") == new String(cp1251Privet, "windows-1252"))
    assert(dec("café".getBytes("ISO-8859-1"), "") == "café")
    // WHATWG 1252, not Java's: the five bytes Java leaves unassigned
    // (0x81/0x8D/0x8F/0x90/0x9D) map to their C1 controls, never U+FFFD
    val c1 = Array(0x90.toByte, 0xE9.toByte) // invalid UTF-8 → 1252 leg
    assert(dec(c1, "") == "\u0090é") // explicit escape: C1 control is invisible
  }

  test("decodeBytes: malformed bytes replace with U+FFFD, never throw") {
    val out = dec(cp1251Privet, "utf-8") // cp1251 bytes are invalid UTF-8
    assert(out.nonEmpty && out.forall(_ == '�'), out)
    // unmappable on the ENCODE side doesn't exist for decode; a truncated
    // multibyte tail is the other real-world malformation
    val cut = "héllo".getBytes("UTF-8").dropRight(1) ++ Array(0xC3.toByte)
    assert(dec(cut, "utf-8").endsWith("�"))
  }

  test("decodeBytes: null payload yields null") {
    val r = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("b")
      .select(Html.decodeBytes(col("b"), lit("utf-8"))).head
    assert(r.isNullAt(0))
  }

  test("sniffCharset + decodeHtmlBytes: declared legacy page decodes; undeclared falls back") {
    val declared = ("<html><head><meta charset=\"windows-1251\"></head><body><p>"
      .getBytes("ISO-8859-1") ++ cp1251Privet ++
      "</p></body></html>".getBytes("ISO-8859-1"))
    val undeclared = "<html><body><p>plain ü</p></body></html>".getBytes("UTF-8")
    val rows = Seq(Tuple1(declared), Tuple1(undeclared)).toDF("b")
      .select(Html.sniffCharset(col("b")).as("cs"),
        Html.extractText(Html.decodeHtmlBytes(col("b"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("windows-1251", "Привет"), ("", "plain ü")))
  }

  test("decode chain stays whole-stage codegen (no UDF/eval node)") {
    val df = spark.range(4)
      .select(encode(concat(lit("<p>x"), col("id"), lit("</p>")), "UTF-8").as("b"))
      .select(Html.extractText(Html.decodeHtmlBytes(col("b"))))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"))
  }

  test("CharsetCodec cache: garbage names don't grow the cache unboundedly") {
    (0 until 2000).foreach(i => CharsetCodec.lookup(s"bogus-$i"))
    assert(CharsetCodec.lookup("utf-8").name() == "UTF-8")
    assert(CharsetCodec.lookup("bogus-xyz").name() == "UTF-8")
  }
}
