package graft.ext

import java.nio.charset.Charset

/** Charset detection + decode for crawled bodies — real corpora are
  * NOT all UTF-8 (windows-1252 long tail, UTF-16 exports, legacy
  * ISO-8859-1 servers), and decoding them as UTF-8 silently replaces
  * every non-ASCII byte with U+FFFD before any downstream text
  * operator sees the page.
  *
  * Detection precedence (the WHATWG encoding sniff, deterministic):
  *  1. BOM — UTF-8 / UTF-16LE / UTF-16BE (authoritative, skipped from
  *     the decoded text);
  *  2. the TRANSPORT charset (Content-Type `charset=` parameter) when
  *     it names a supported encoding;
  *  3. an HTML `<meta charset=...>` / `http-equiv` declaration in the
  *     first 1024 bytes;
  *  4. strict UTF-8 validation — a body that validates IS UTF-8
  *     (ASCII included);
  *  5. windows-1252 fallback (every byte decodes; supersedes
  *     ISO-8859-1 per the living standard's alias rule).
  *
  * Total and never throws: every byte sequence decodes under this
  * policy (steps 4/5 guarantee an answer).
  */
object Charsets {

  /** Canonical JDK charset name for a declared label; None =
    * unrecognized label (detection falls through to the next step,
    * never throws). Labels follow the WHATWG Encoding registry — a
    * real multilingual crawl is full of CJK/Cyrillic declarations, and
    * dropping them to the cp1252 fallback mojibakes every such page
    * before any text operator sees it. All targets ship with the JDK.
    */
  def canonical(label: String): Option[String] = {
    val l = label.trim.toLowerCase(java.util.Locale.ROOT)
      .stripPrefix("\"").stripSuffix("\"")
    l match {
      case "utf-8" | "utf8" => Some("UTF-8")
      case "iso-8859-1" | "latin-1" | "latin1" | "l1" | "windows-1252" |
          "cp1252" | "ascii" | "us-ascii" =>
        // the WHATWG alias rule: the 8859-1 family is SERVED as 1252
        Some("windows-1252")
      case "utf-16" | "utf-16le" => Some("UTF-16LE")
      case "utf-16be" => Some("UTF-16BE")
      // Japanese: WHATWG's Shift_JIS decoder carries the Microsoft
      // extensions — windows-31j (MS932) is the JDK charset with the
      // same repertoire, so every shift_jis-family label maps there
      case "shift_jis" | "shift-jis" | "sjis" | "x-sjis" | "ms_kanji" |
          "ms932" | "csshiftjis" | "windows-31j" =>
        Some("windows-31j")
      case "euc-jp" | "x-euc-jp" | "cseucpkdfmtjapanese" => Some("EUC-JP")
      case "iso-2022-jp" | "csiso2022jp" => Some("ISO-2022-JP")
      // Simplified Chinese: WHATWG unifies the gb2312 family into GBK
      case "gbk" | "gb2312" | "gb_2312" | "gb_2312-80" | "chinese" |
          "csgb2312" | "csiso58gb231280" | "iso-ir-58" | "x-gbk" =>
        Some("GBK")
      case "gb18030" => Some("GB18030")
      // Traditional Chinese: WHATWG maps the hkscs label to Big5 too
      case "big5" | "big5-hkscs" | "cn-big5" | "csbig5" | "x-x-big5" =>
        Some("Big5")
      // Korean: WHATWG unifies the ksc/windows-949 family into its
      // euc-kr, whose repertoire is the UHC superset — the JDK charset
      // with that repertoire is MS949 (x-windows-949), same superset
      // rule as shift_jis → windows-31j above; plain EUC-KR would drop
      // the extended-hangul rows to replacement chars
      case "euc-kr" | "cseuckr" | "csksc56011987" | "iso-ir-149" |
          "korean" | "ks_c_5601-1987" | "ks_c_5601-1989" | "ksc5601" |
          "ksc_5601" | "windows-949" =>
        Some("x-windows-949")
      case "koi8-r" | "koi8_r" | "koi8" | "cskoi8r" => Some("KOI8-R")
      case "koi8-u" | "koi8-ru" => Some("KOI8-U")
      case "windows-1250" | "cp1250" | "x-cp1250" => Some("windows-1250")
      case "windows-1251" | "cp1251" | "x-cp1251" => Some("windows-1251")
      case "windows-1254" | "cp1254" | "x-cp1254" | "iso-8859-9" |
          "iso8859-9" | "iso88599" | "iso_8859-9" | "iso_8859-9:1989" |
          "iso-ir-148" | "latin5" | "l5" | "csisolatin5" =>
        // same WHATWG superset rule as 8859-1 → 1252
        Some("windows-1254")
      // Central European: WHATWG keeps 8859-2 distinct from 1250
      case "iso-8859-2" | "iso8859-2" | "iso88592" | "iso_8859-2" |
          "iso_8859-2:1987" | "iso-ir-101" | "latin2" | "l2" |
          "csisolatin2" =>
        Some("ISO-8859-2")
      // Thai: WHATWG decodes the whole tis-620/8859-11 family as the
      // windows-874 superset (same rule as 8859-1 → 1252)
      case "windows-874" | "cp874" | "x-cp874" | "dos-874" | "tis-620" |
          "iso-8859-11" | "iso8859-11" | "iso885911" =>
        Some("x-windows-874")
      // Greek: 1253 and 8859-7 stay distinct in the WHATWG registry
      case "windows-1253" | "cp1253" | "x-cp1253" => Some("windows-1253")
      case "iso-8859-7" | "iso8859-7" | "iso88597" | "iso_8859-7" |
          "iso_8859-7:1987" | "iso-ir-126" | "ecma-118" | "elot_928" |
          "greek" | "greek8" | "csisolatingreek" | "sun_eu_greek" =>
        Some("ISO-8859-7")
      // Hebrew: the 1255 labels stay themselves; the logical-order
      // labels (iso-8859-8-i/csiso88598i/logical) map to WHATWG's
      // ISO-8859-8-I, whose DECODER is byte-identical to ISO-8859-8
      // (the -I bit is a bidi-presentation flag, not a byte map) — NOT
      // to windows-1255, which differs at 0xA4 (sheqel vs currency
      // sign), 0xAA, and maps 0xC0-0xCF to niqqud where 8859-8 is
      // undefined
      case "windows-1255" | "cp1255" | "x-cp1255" =>
        Some("windows-1255")
      case "iso-8859-8" | "iso8859-8" | "iso88598" | "iso_8859-8" |
          "iso_8859-8:1988" | "iso-ir-138" | "hebrew" | "visual" |
          "csisolatinhebrew" | "csiso88598e" | "iso-8859-8-i" |
          "csiso88598i" | "logical" =>
        Some("ISO-8859-8")
      // Arabic: 1256 and 8859-6 stay distinct
      case "windows-1256" | "cp1256" | "x-cp1256" => Some("windows-1256")
      case "iso-8859-6" | "iso8859-6" | "iso88596" | "iso_8859-6" |
          "iso_8859-6:1987" | "iso-ir-127" | "arabic" | "asmo-708" |
          "ecma-114" | "csisolatinarabic" | "csiso88596e" |
          "csiso88596i" =>
        Some("ISO-8859-6")
      // Baltic: WHATWG keeps 1257 and 8859-13 distinct
      case "windows-1257" | "cp1257" | "x-cp1257" => Some("windows-1257")
      case "iso-8859-13" | "iso8859-13" | "iso885913" =>
        Some("ISO-8859-13")
      case _ => None
    }
  }

  /** Strict UTF-8 validation: correct continuation counts, no
    * overlongs (C0/C1, E0 80-9F, F0 80-8F), no surrogates (ED A0-BF),
    * max U+10FFFF (F4 90+ rejected, F5+ rejected).
    */
  def isValidUtf8(b: Array[Byte], from: Int = 0): Boolean = {
    var i = from
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else {
        val (len, lo, hi) =
          if (c >= 0xc2 && c <= 0xdf) (2, 0x80, 0xbf)
          else if (c == 0xe0) (3, 0xa0, 0xbf)
          else if (c == 0xed) (3, 0x80, 0x9f)
          else if (c >= 0xe1 && c <= 0xef) (3, 0x80, 0xbf)
          else if (c == 0xf0) (4, 0x90, 0xbf)
          else if (c >= 0xf1 && c <= 0xf3) (4, 0x80, 0xbf)
          else if (c == 0xf4) (4, 0x80, 0x8f)
          else return false
        if (i + len > n) return false
        val c1 = b(i + 1) & 0xff
        if (c1 < lo || c1 > hi) return false
        var k = 2
        while (k < len) {
          val ck = b(i + k) & 0xff
          if (ck < 0x80 || ck > 0xbf) return false
          k += 1
        }
        i += len
      }
    }
    true
  }

  /** `<meta charset=...>` / `http-equiv Content-Type` label in the
    * first 1024 bytes (scanned as Latin-1 — the prescan is
    * ASCII-shaped by construction). Only a `charset=` INSIDE a <meta>
    * tag counts — an `accept-charset` form attribute, a `?charset=`
    * link, or a comment mentioning it must not hijack detection.
    */
  def metaLabel(b: Array[Byte], from: Int = 0): Option[String] = {
    val head = new String(b, from, math.min(1024, b.length - from),
      "ISO-8859-1")
      .toLowerCase(java.util.Locale.ROOT)
    var m = head.indexOf("<meta")
    while (m >= 0) {
      val gt = head.indexOf('>', m)
      val tag = head.substring(m, if (gt < 0) head.length else gt)
      val at = tag.indexOf("charset=")
      // reject accept-charset= (the char before is '-')
      if (at >= 0 && (at == 0 || tag.charAt(at - 1) != '-')) {
        var i = at + 8
        if (i < tag.length && (tag.charAt(i) == '"' || tag.charAt(i) == '\''))
          i += 1
        val start = i
        while (i < tag.length && !"\"';> \t\r\n/".contains(tag.charAt(i)))
          i += 1
        if (i > start) return Some(tag.substring(start, i))
      }
      m = head.indexOf("<meta", m + 5)
    }
    None
  }

  /** (detected charset name, byte offset where the text starts —
    * nonzero only for a BOM).
    */
  def detect(b: Array[Byte], transport: Option[String],
      from: Int = 0): (String, Int) = {
    val n = b.length - from
    if (n >= 3 && (b(from) & 0xff) == 0xef && (b(from + 1) & 0xff) == 0xbb &&
        (b(from + 2) & 0xff) == 0xbf) return ("UTF-8", from + 3)
    if (n >= 2 && (b(from) & 0xff) == 0xff && (b(from + 1) & 0xff) == 0xfe)
      return ("UTF-16LE", from + 2)
    if (n >= 2 && (b(from) & 0xff) == 0xfe && (b(from + 1) & 0xff) == 0xff)
      return ("UTF-16BE", from + 2)
    transport.flatMap(canonical).map((_, from)).getOrElse {
      val meta = metaLabel(b, from).flatMap(canonical).map {
        // the WHATWG prescan override: an ASCII-readable <meta> cannot
        // sit inside a real UTF-16 document, so a UTF-16 label from
        // the prescan means UTF-8
        case "UTF-16LE" | "UTF-16BE" => "UTF-8"
        case other => other
      }
      meta.map((_, from)).getOrElse(
        if (isValidUtf8(b, from)) ("UTF-8", from)
        else ("windows-1252", from))
    }
  }

  /** Decode under the detection policy FROM an offset (zero-copy for
    * in-place body slices): (text, charset used). Total -- UTF-16 of
    * odd length decodes its even prefix (the replacement behavior a
    * lenient decoder applies), 1252 accepts every byte.
    */
  def decode(b: Array[Byte], transport: Option[String] = None,
      from: Int = 0): (String, String) = {
    val (name, skip) = detect(b, transport, from)
    val cs = Charset.forName(name)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val text = dec.decode(
      java.nio.ByteBuffer.wrap(b, skip, b.length - skip)).toString
    (text, name)
  }

  // ------------------------------------------------------------------
  // Spark stage + fixture twin
  // ------------------------------------------------------------------

  /** (doc_id, bytes, transport) → (doc_id, charset, decoded): the
    * ingest-side transcode stage — per-row detection in mapPartitions,
    * zero shuffle, total (every blob decodes).
    */
  def decodeFrame(media: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes", "transport")
      .as[(Long, Array[Byte], Option[String])]
      .mapPartitions(_.map { case (id, b, t) =>
        val (text, cs) = decode(b, t)
        (id, cs, text)
      }).toDF("doc_id", "charset", "decoded")
  }

  /** Sixteen-way encoded corpus: each document's text plus a
    * non-ASCII marker the target charset can carry, encoded by id%16 as
    *  0: UTF-8 with BOM (BOM precedence),
    *  1: UTF-16LE with BOM,
    *  2: windows-1252 declared by TRANSPORT only,
    *  3: ISO-8859-1 declared by a leading meta tag (the tag is part
    *     of the text; the alias rule maps the label to windows-1252),
    *  4: plain UTF-8, no BOM and no declaration (the validation path —
    *     the marker's multi-byte sequences are what validates),
    *  5: Shift_JIS by transport under the `shift_jis` label (decodes
    *     via windows-31j, the WHATWG repertoire) — katakana marker,
    *  6: EUC-JP by meta tag — kanji marker,
    *  7: GBK by transport under the legacy `gb2312` label — the
    *     WHATWG gb-family unification witness,
    *  8: Big5 by meta tag — traditional-Chinese marker,
    *  9: UHC by transport under the `korean` label — hangul marker
    *     including 뷁, a syllable OUTSIDE KS X 1001 that witnesses the
    *     windows-949 superset mapping (plain EUC-KR would '?' it),
    * 10: ISO-8859-2 by transport under the `latin2` label — Czech
    *     marker (č/š are NOT in 1252 — a fallback would mojibake),
    * 11: windows-874 by meta tag under the `tis-620` label — Thai
    *     marker (the WHATWG 874-superset rule, like 8859-1 → 1252),
    * 12: windows-1253 by transport under `cp1253` — Greek marker,
    * 13: ISO-8859-8 by meta tag under the LOGICAL-order Hebrew label
    *     `iso-8859-8-i` (WHATWG ISO-8859-8-I — decoder byte-identical
    *     to 8859-8) — Hebrew marker,
    * 14: windows-1256 by transport under `cp1256` — Arabic marker,
    * 15: windows-1257 by meta tag — Lithuanian marker (ą/ž).
    * Families 0–4 carry " café À<id%7>" (Latin-1-representable);
    * 5–15 carry their own script marker + id%7. A blind UTF-8 decode
    * would U+FFFD families 1/2/3/5..15 — the oracle rebuilds charset +
    * decoded text per family in closed form.
    */
  def syntheticEncodedDocs(
      docs: org.apache.spark.sql.Dataset[(java.lang.Long, String)])
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (boxed, text) =>
      val id = boxed.longValue()
      val fam = (id % 16).toInt
      // families 2/3 encode via single-byte charsets and 5-15 via
      // legacy ones, where getBytes SILENTLY writes '?' for unmappable
      // chars and the oracle (which carries the original text) would
      // mismatch by one baffling character — fail LOUD instead if the
      // corpus ever gains one. The guard rejects C1 controls too:
      // U+0080-U+009F don't round-trip windows-1252 (getBytes '?'s
      // them) and 0x80-0x9F BYTES decode back as cp1252 punctuation
      // under the alias rule.
      def latin1Safe(s: String): Boolean =
        s.forall(c => c <= 'ÿ' && !(c >= 0x80.toChar && c <= 0x9f.toChar))
      if (fam == 2 || fam == 3)
        require(latin1Safe(text),
          s"doc $id: text has a non-Latin-1 or C1 char; the 1252/" +
            "8859-1 fixture families cannot encode it losslessly")
      if (fam >= 5)
        require(text.forall(_ < 0x80.toChar),
          s"doc $id: text has a non-ASCII char; the legacy fixture " +
            "families only guarantee lossless encode for ASCII text")
      val full = text + (fam match {
        case 5 => s" テスト${id % 7}"
        case 6 => s" 日本語${id % 7}"
        case 7 => s" 中文${id % 7}"
        case 8 => s" 繁體字${id % 7}"
        case 9 => s" 한국어뷁${id % 7}"
        case 10 => s" čeština${id % 7}"
        case 11 => s" ไทย${id % 7}"
        case 12 => s" Ελληνικά${id % 7}"
        case 13 => s" עברית${id % 7}"
        case 14 => s" العربية${id % 7}"
        case 15 => s" ąžuolas${id % 7}"
        case _ => s" café À${id % 7}"
      })
      val (bytes, transport): (Array[Byte], Option[String]) = fam match {
        case 0 =>
          (Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
            full.getBytes("UTF-8"), None)
        case 1 =>
          (Array[Byte](0xff.toByte, 0xfe.toByte) ++
            full.getBytes("UTF-16LE"), None)
        case 2 => (full.getBytes("windows-1252"), Some("windows-1252"))
        case 3 =>
          (("<meta charset=\"iso-8859-1\">" + full)
            .getBytes("ISO-8859-1"), None)
        case 4 => (full.getBytes("UTF-8"), None)
        case 5 => (full.getBytes("windows-31j"), Some("shift_jis"))
        case 6 =>
          (("<meta charset=\"euc-jp\">" + full).getBytes("EUC-JP"), None)
        case 7 => (full.getBytes("GBK"), Some("gb2312"))
        case 8 =>
          (("<meta charset=\"big5\">" + full).getBytes("Big5"), None)
        case 9 => (full.getBytes("x-windows-949"), Some("korean"))
        case 10 => (full.getBytes("ISO-8859-2"), Some("latin2"))
        case 11 =>
          (("<meta charset=\"tis-620\">" + full)
            .getBytes("x-windows-874"), None)
        case 12 => (full.getBytes("windows-1253"), Some("cp1253"))
        case 13 =>
          (("<meta charset=\"iso-8859-8-i\">" + full)
            .getBytes("ISO-8859-8"), None)
        case 14 => (full.getBytes("windows-1256"), Some("cp1256"))
        case _ =>
          (("<meta charset=\"windows-1257\">" + full)
            .getBytes("windows-1257"), None)
      }
      (id, bytes, transport)
    }).toDF("doc_id", "bytes", "transport")
  }
}
