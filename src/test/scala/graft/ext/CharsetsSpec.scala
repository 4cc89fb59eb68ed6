package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Charset sniff + decode: BOM precedence, transport/meta labels with
  * the WHATWG 8859-1→1252 alias, strict UTF-8 validation (overlongs,
  * surrogates, out-of-range), cp1252 fallback, totality.
  */
class CharsetsSpec extends AnyFunSuite with SparkTestBase {

  test("strict UTF-8 validation rejects what lenient decoders accept") {
    assert(Charsets.isValidUtf8("plain ascii".getBytes("UTF-8")))
    assert(Charsets.isValidUtf8("café № 𝄞".getBytes("UTF-8")))
    // overlong '/' (C0 AF)
    assert(!Charsets.isValidUtf8(Array(0xc0.toByte, 0xaf.toByte)))
    // surrogate U+D800 (ED A0 80)
    assert(!Charsets.isValidUtf8(Array(0xed.toByte, 0xa0.toByte, 0x80.toByte)))
    // past U+10FFFF (F4 90 80 80)
    assert(!Charsets.isValidUtf8(Array(0xf4.toByte, 0x90.toByte,
      0x80.toByte, 0x80.toByte)))
    // truncated multi-byte
    assert(!Charsets.isValidUtf8("é".getBytes("UTF-8").take(1)))
    // bare continuation byte / F5 lead
    assert(!Charsets.isValidUtf8(Array(0x80.toByte)))
    assert(!Charsets.isValidUtf8(Array(0xf5.toByte, 0x80.toByte,
      0x80.toByte, 0x80.toByte)))
  }

  test("detection precedence: BOM > transport > meta > validation > 1252") {
    // BOM wins even against a lying transport label
    val bomUtf8 = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "hié".getBytes("UTF-8")
    assert(Charsets.decode(bomUtf8, Some("windows-1252")) == ("hié", "UTF-8"))
    val bomLe = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      "hié".getBytes("UTF-16LE")
    assert(Charsets.decode(bomLe) == ("hié", "UTF-16LE"))
    // transport beats meta
    val meta1252 = "<meta charset='utf-8'>café"
    assert(Charsets.decode(meta1252.getBytes("windows-1252"),
      Some("iso-8859-1")) == (meta1252, "windows-1252"))
    // meta when no transport (label canonicalizes via the alias rule)
    val m = "<meta charset=\"latin-1\">olé".getBytes("ISO-8859-1")
    assert(Charsets.decode(m) ==
      ("<meta charset=\"latin-1\">olé", "windows-1252"))
    // nothing declared, valid utf-8 → utf-8
    assert(Charsets.decode("naïve".getBytes("UTF-8")) == ("naïve", "UTF-8"))
    // nothing declared, NOT valid utf-8 → 1252 fallback (0xE9 = é)
    assert(Charsets.decode("café".getBytes("windows-1252")) ==
      ("café", "windows-1252"))
    // unknown label falls through to validation, not a throw
    assert(Charsets.decode("ok".getBytes("UTF-8"),
      Some("klingon-8")) == ("ok", "UTF-8"))
  }

  test("charset= outside a <meta> tag never hijacks detection") {
    // accept-charset on a form must not count...
    val form = "<form accept-charset=\"utf-16le\">café</form>"
      .getBytes("windows-1252")
    assert(Charsets.decode(form) == (
      "<form accept-charset=\"utf-16le\">café</form>", "windows-1252"))
    // ...nor a charset= inside a link query string
    val link = "<a href=\"/c?charset=utf-16le\">olé</a>"
      .getBytes("windows-1252")
    assert(Charsets.decode(link)._2 == "windows-1252")
  }

  test("WHATWG prescan override: a meta-declared utf-16 means utf-8") {
    // an ASCII-readable <meta> cannot live inside real UTF-16 bytes
    val lying = "<meta charset=\"utf-16\">plain ascii".getBytes("UTF-8")
    assert(Charsets.decode(lying) ==
      ("<meta charset=\"utf-16\">plain ascii", "UTF-8"))
  }

  test("1252-specific high bytes decode as 1252, not 8859-1 controls") {
    // 0x93/0x94 are curly quotes in cp1252, C1 controls in 8859-1
    val b = Array[Byte](0x93.toByte, 'h'.toByte, 'i'.toByte, 0x94.toByte)
    assert(Charsets.decode(b)._1 == "“hi”")
  }

  test("totality: random bytes always decode, never throw") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val b = Array.fill(rnd.nextInt(512))(rnd.nextInt(256).toByte)
      val (text, cs) = Charsets.decode(b)
      assert(cs == "UTF-8" || cs == "windows-1252" ||
        cs == "UTF-16LE" || cs == "UTF-16BE")
      assert(text != null)
    }
  }

  test("warc integration: a cp1252 page keeps its accents end-to-end") {
    val body = "<html><body><a href=\"/x\">café</a></body></html>"
    val resp = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=windows-1252\r\n\r\n")
      .getBytes("ISO-8859-1") ++ body.getBytes("windows-1252")
    val html = graft.wat.WarcHtml.htmlOfHttpResponse(resp).get
    assert(html.contains("café"))
    // and without the charset param the same bytes fall back via
    // UTF-8-validation failure → 1252, SAME text
    val resp2 = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html\r\n\r\n").getBytes("ISO-8859-1") ++
      body.getBytes("windows-1252")
    assert(graft.wat.WarcHtml.htmlOfHttpResponse(resp2).get.contains("café"))
  }

  test("decodeFrame stage over the sixteen-way encoded corpus") {
    import spark.implicits._
    val docs = spark.createDataset((0L to 31L).map(i =>
      (java.lang.Long.valueOf(i), s"text $i")))
    val out = Charsets.decodeFrame(Charsets.syntheticEncodedDocs(docs))
      .as[(Long, String, String)].collect().map(r => r._1 -> r).toMap
    assert(out(0L)._2 == "UTF-8" && out(0L)._3 == "text 0 café À0")
    assert(out(1L)._2 == "UTF-16LE" && out(1L)._3 == "text 1 café À1")
    assert(out(2L)._2 == "windows-1252")
    assert(out(3L)._2 == "windows-1252" &&
      out(3L)._3 == "<meta charset=\"iso-8859-1\">text 3 café À3")
    assert(out(4L)._2 == "UTF-8" && out(4L)._3 == "text 4 café À4")
    // the CJK long tail: legacy labels, lossless markers
    assert(out(5L)._2 == "windows-31j" && out(5L)._3 == "text 5 テスト5")
    assert(out(6L)._2 == "EUC-JP" &&
      out(6L)._3 == "<meta charset=\"euc-jp\">text 6 日本語6")
    assert(out(7L)._2 == "GBK" && out(7L)._3 == "text 7 中文0")
    assert(out(8L)._2 == "Big5" &&
      out(8L)._3 == "<meta charset=\"big5\">text 8 繁體字1")
    // 뷁 is outside KS X 1001: only the 949 superset carries it
    assert(out(9L)._2 == "x-windows-949" &&
      out(9L)._3 == "text 9 한국어뷁2")
    // the single-byte long tail
    assert(out(10L)._2 == "ISO-8859-2" &&
      out(10L)._3 == "text 10 čeština3")
    assert(out(11L)._2 == "x-windows-874" &&
      out(11L)._3 == "<meta charset=\"tis-620\">text 11 ไทย4")
    assert(out(12L)._2 == "windows-1253" &&
      out(12L)._3 == "text 12 Ελληνικά5")
    assert(out(13L)._2 == "ISO-8859-8" &&
      out(13L)._3 == "<meta charset=\"iso-8859-8-i\">text 13 עברית6")
    assert(out(14L)._2 == "windows-1256" &&
      out(14L)._3 == "text 14 العربية0")
    assert(out(15L)._2 == "windows-1257" &&
      out(15L)._3 == "<meta charset=\"windows-1257\">text 15 ąžuolas1")
    assert(out.size == 32)
  }

  test("WHATWG legacy labels canonicalize to their JDK charsets") {
    assert(Charsets.canonical("SJIS").contains("windows-31j"))
    assert(Charsets.canonical("x-sjis").contains("windows-31j"))
    assert(Charsets.canonical("ms_kanji").contains("windows-31j"))
    assert(Charsets.canonical("GB2312").contains("GBK"))
    assert(Charsets.canonical("csiso58gb231280").contains("GBK"))
    assert(Charsets.canonical("gb18030").contains("GB18030"))
    assert(Charsets.canonical("big5-hkscs").contains("Big5"))
    // the Korean family lands on the UHC superset (MS949), matching
    // the shift_jis → windows-31j superset rule
    assert(Charsets.canonical("ks_c_5601-1987").contains("x-windows-949"))
    assert(Charsets.canonical("windows-949").contains("x-windows-949"))
    assert(Charsets.canonical("euc-kr").contains("x-windows-949"))
    assert(Charsets.canonical("cskoi8r").contains("KOI8-R"))
    assert(Charsets.canonical("iso-8859-9").contains("windows-1254"))
    // the single-byte long tail: WHATWG keeps the 8859 pages distinct
    // from their windows cousins except Thai (874 superset); the
    // logical-order Hebrew labels map to ISO-8859-8-I, whose DECODER
    // is ISO-8859-8 (not windows-1255, which differs at 0xA4/0xAA and
    // the 0xC0-0xCF niqqud block)
    assert(Charsets.canonical("latin2").contains("ISO-8859-2"))
    assert(Charsets.canonical("iso_8859-2:1987").contains("ISO-8859-2"))
    assert(Charsets.canonical("tis-620").contains("x-windows-874"))
    assert(Charsets.canonical("iso-8859-11").contains("x-windows-874"))
    assert(Charsets.canonical("dos-874").contains("x-windows-874"))
    assert(Charsets.canonical("x-cp1253").contains("windows-1253"))
    assert(Charsets.canonical("greek8").contains("ISO-8859-7"))
    assert(Charsets.canonical("sun_eu_greek").contains("ISO-8859-7"))
    assert(Charsets.canonical("iso-8859-8-i").contains("ISO-8859-8"))
    assert(Charsets.canonical("logical").contains("ISO-8859-8"))
    assert(Charsets.canonical("csiso88598i").contains("ISO-8859-8"))
    assert(Charsets.canonical("visual").contains("ISO-8859-8"))
    assert(Charsets.canonical("hebrew").contains("ISO-8859-8"))
    assert(Charsets.canonical("cp1255").contains("windows-1255"))
    // the distinguishing byte: 0xA4 is U+00A4 (currency sign) in
    // 8859-8 but U+20AA (sheqel) in 1255 — the logical-order label
    // must take the 8859-8 reading, the 1255 label its own
    val a4 = Array(0xa4.toByte)
    assert(Charsets.decode(a4, Some("iso-8859-8-i"))._1 == "¤")
    assert(Charsets.decode(a4, Some("windows-1255"))._1 == "₪")
    assert(Charsets.canonical("asmo-708").contains("ISO-8859-6"))
    assert(Charsets.canonical("cp1256").contains("windows-1256"))
    assert(Charsets.canonical("cp1257").contains("windows-1257"))
    assert(Charsets.canonical("iso-8859-13").contains("ISO-8859-13"))
    // every canonical target must actually resolve in this JVM
    for (label <- Seq("shift_jis", "euc-jp", "iso-2022-jp", "gbk",
        "gb18030", "big5", "euc-kr", "koi8-r", "koi8-u",
        "windows-1250", "windows-1251", "windows-1254", "iso-8859-2",
        "tis-620", "windows-1253", "iso-8859-7", "windows-1255",
        "iso-8859-8", "windows-1256", "iso-8859-6", "windows-1257",
        "iso-8859-13"))
      java.nio.charset.Charset.forName(Charsets.canonical(label).get)
  }

  test("legacy transport/meta decode beats the 1252 fallback") {
    // Shift_JIS katakana by transport: bytes are NOT valid UTF-8, so
    // without the label this would mojibake via the 1252 fallback
    val sj = "テスト".getBytes("windows-31j")
    assert(Charsets.decode(sj, Some("shift_jis")) == ("テスト", "windows-31j"))
    assert(Charsets.decode(sj)._2 == "windows-1252") // the counterfactual
    // Korean hangul by meta prescan decodes via the UHC superset —
    // including 뷁, which plain EUC-KR cannot represent
    val kr = "<meta charset=\"euc-kr\">한국뷁".getBytes("x-windows-949")
    assert(Charsets.decode(kr) ==
      ("<meta charset=\"euc-kr\">한국뷁", "x-windows-949"))
    // GB18030 4-byte sequence round-trips
    val gb = "ḿ".getBytes("GB18030") // U+1E3F, a 4-byte GB18030 code
    assert(Charsets.decode(gb, Some("gb18030")) == ("ḿ", "GB18030"))
    // Thai by transport tis-620 label → the 874 superset
    val th = "ไทย".getBytes("x-windows-874")
    assert(Charsets.decode(th, Some("TIS-620")) == ("ไทย", "x-windows-874"))
    // Greek by meta
    val el = "<meta charset=\"greek\">αβγ".getBytes("ISO-8859-7")
    assert(Charsets.decode(el) ==
      ("<meta charset=\"greek\">αβγ", "ISO-8859-7"))
  }
}
