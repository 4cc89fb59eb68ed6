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

  /** Canonical name for a declared label; None = unrecognized label
    * (detection falls through to the next step, never throws).
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

  /** Five-way encoded corpus: each document's text plus a non-ASCII
    * marker (" café À<id%7>" — Latin-1-representable so every target
    * charset can carry it), encoded by id%5 as
    *  0: UTF-8 with BOM (BOM precedence),
    *  1: UTF-16LE with BOM,
    *  2: windows-1252 declared by TRANSPORT only,
    *  3: ISO-8859-1 declared by a leading meta tag (the tag is part
    *     of the text; the alias rule maps the label to windows-1252),
    *  4: plain UTF-8, no BOM and no declaration (the validation path —
    *     the marker's multi-byte sequences are what validates).
    * The q_charset_decode oracle rebuilds charset + decoded text per
    * family in closed form.
    */
  def syntheticEncodedDocs(
      docs: org.apache.spark.sql.Dataset[(java.lang.Long, String)])
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (boxed, text) =>
      val id = boxed.longValue()
      val full = text + s" café À${id % 7}"
      // families 2/3 encode via single-byte charsets, where getBytes
      // SILENTLY writes '?' for unmappable chars and the oracle (which
      // carries the original text) would mismatch by one baffling
      // character — fail LOUD instead if the corpus ever gains one
      if (id % 5 == 2 || id % 5 == 3)
        require(full.forall(_ <= 'ÿ'),
          s"doc $id: text has a non-Latin-1 char; the 1252/8859-1 " +
            "fixture families cannot encode it losslessly")
      val (bytes, transport): (Array[Byte], Option[String]) = (id % 5) match {
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
        case _ => (full.getBytes("UTF-8"), None)
      }
      (id, bytes, transport)
    }).toDF("doc_id", "bytes", "transport")
  }
}
