package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** PDF parser/muxer: xref + trailer walk, indirect-object resolution,
  * FlateDecode streams, text-op interpretation (Tj/TJ/'/" + escapes +
  * hex strings + line moves), Info metadata, hostile-input rejection.
  */
class PdfSpec extends AnyFunSuite with SparkTestBase {

  private def spec(pages: Seq[Seq[String]], seed: Long = 0,
      flate: Boolean = true, modern: Boolean = false) =
    Pdf.BuildSpec(pages, title = "T", author = "A", producer = "P",
      created = "D:20240101000000", seed = seed, flate = flate,
      modern = modern)

  test("roundtrip: multi-page text, all three chunk encodings, flate, " +
      "both layouts") {
    for (seed <- 0L to 2L; flate <- Seq(true, false);
        modern <- Seq(false, true)) {
      val pages = Seq(Seq("first line", "second one"), Seq("page two"))
      val pdf = Pdf.write(spec(pages, seed, flate, modern))
      assert(Pdf.isPdf(pdf))
      assert(Pdf.extractText(pdf).contains(
        "first line\nsecond one\npage two"),
        s"seed=$seed flate=$flate modern=$modern")
    }
  }

  test("modern layout: xref stream + ObjStm resolve, version 1.5") {
    val pdf = Pdf.write(spec(Seq(Seq("a"), Seq("b")), modern = true))
    val m = Pdf.meta(pdf).get
    assert(m.version == "1.5" && m.nPages == 2 && m.title == "T" && m.xrefOk)
    // the bytes really are the modern shape: no classic xref keyword
    assert(!new String(pdf, "ISO-8859-1").contains("\nxref\n"))
    assert(new String(pdf, "ISO-8859-1").contains("/Type /ObjStm"))
    // an incremental CLASSIC update on top of a modern base: the /Prev
    // chain crosses layouts (the acrobat-touches-a-modern-file shape)
    val infoNum = "/Info (\\d+) 0 R".r
      .findFirstMatchIn(new String(pdf, "ISO-8859-1")).get.group(1).toInt
    val updated = withUpdate(pdf, infoNum, Some("<< /Title (Mixed) >>"))
    assert(Pdf.meta(updated).get.title == "Mixed")
    assert(Pdf.extractText(updated).contains("a\nb"))
  }

  test("metadata: version, page count, Info fields, xref validation") {
    val pdf = Pdf.write(spec(Seq(Seq("a"), Seq("b"), Seq("c"))))
    val m = Pdf.meta(pdf).get
    assert(m.version == "1.4" && m.nPages == 3)
    assert(m.title == "T" && m.author == "A" && m.producer == "P")
    assert(m.created == "D:20240101000000" && m.xrefOk)
  }

  test("literal-string escapes and specials round-trip") {
    val tricky = "parens (nested) \\ backslash\nnewline\ttab"
    val pdf = Pdf.write(spec(Seq(Seq(tricky)), seed = 0)) // literal path
    assert(Pdf.extractText(pdf).contains(tricky))
    val pdfHex = Pdf.write(spec(Seq(Seq(tricky)), seed = 1)) // hex path
    assert(Pdf.extractText(pdfHex).contains(tricky))
  }

  test("' and \" operators show with an implicit line move") {
    // same-length stream surgery: swap the uncompressed content for a
    // crafted operator run padded with spaces, so every xref offset
    // and /Length stays valid
    val pdf = Pdf.write(spec(Seq(Seq("long placeholder chunk text " +
      "for stream surgery padding")), seed = 0, flate = false))
    val s = new String(pdf, "ISO-8859-1")
    val a = s.indexOf("stream\n") + 7
    val b = s.indexOf("\nendstream")
    val crafted = "BT (one) Tj 0 -14 Td (two) ' (three) \" ET"
    assert(crafted.length <= b - a, "placeholder too short")
    val body = crafted + " " * (b - a - crafted.length)
    val doctored = (s.substring(0, a) + body + s.substring(b))
      .getBytes("ISO-8859-1")
    // Tj shows; Td breaks; ' shows on a fresh line (its own break is
    // a no-op right after Td); " breaks then shows
    assert(Pdf.extractText(doctored).contains("one\ntwo\nthree"))
  }

  test("hostile input: truncations, mutations, cycles fail closed") {
    val pdf = Pdf.write(spec(Seq(Seq("hello", "world"), Seq("again"))))
    for (cut <- 0 to pdf.length by 13) {
      Pdf.parse(pdf.take(cut)); Pdf.meta(pdf.take(cut))
      Pdf.extractText(pdf.take(cut)) // no throw is the property
    }
    assert(Pdf.parse("%PDF-1.4 garbage".getBytes("UTF-8")).isEmpty)
    assert(Pdf.parse(Array.empty[Byte]).isEmpty)
    // xref offset pointing at the wrong object: parse succeeds but the
    // xref_ok witness goes false (offsets land on SOME object header)
    // — and a flipped startxref target fails closed entirely
    val s = new String(pdf, "ISO-8859-1")
    val sx = s.lastIndexOf("startxref")
    val bad = (s.substring(0, sx) + "startxref\n2\n%%EOF\n")
      .getBytes("ISO-8859-1")
    assert(Pdf.parse(bad).isEmpty)
  }

  test("xref stream / Encrypt / broken Prev target fail closed") {
    val pdf = Pdf.write(spec(Seq(Seq("x"))))
    val s = new String(pdf, "ISO-8859-1")
    // /Prev 0 points at the header, not an xref section
    val withPrev = s.replace("/Size", "/Prev 0 /Size")
    assert(Pdf.parse(withPrev.getBytes("ISO-8859-1")).isEmpty)
    val withEnc = s.replace("/Size", "/Encrypt 9 0 R /Size")
    assert(Pdf.parse(withEnc.getBytes("ISO-8859-1")).isEmpty)
    val withXs = s.replace("/Size", "/XRefStm 7 /Size")
    assert(Pdf.parse(withXs.getBytes("ISO-8859-1")).isEmpty)
  }

  /** Append an incremental update carrying one replacement object (or
    * a deletion when `objBody` is None) plus its xref + /Prev trailer.
    */
  private def withUpdate(pdf: Array[Byte], objNum: Int,
      objBody: Option[String]): Array[Byte] = {
    val s = new String(pdf, "ISO-8859-1")
    val oldXref = s.substring(s.lastIndexOf("startxref") + 9)
      .trim.split("\\s+")(0).toInt
    val size = "/Size (\\d+)".r.findFirstMatchIn(s).get.group(1).toInt
    val infoRef = "/Info (\\d+) 0 R".r.findFirstMatchIn(s).get.group(1).toInt
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(pdf, 0, pdf.length)
    val entry = objBody match {
      case Some(body) =>
        val off = bos.size()
        bos.write(s"$objNum 0 obj\n$body\nendobj\n".getBytes("ISO-8859-1"))
        f"$off%010d 00000 n \n"
      case None => "0000000000 00001 f \n"
    }
    val xrefOff = bos.size()
    bos.write((s"xref\n$objNum 1\n" + entry +
      s"trailer\n<< /Size $size /Root 1 0 R /Info $infoRef 0 R " +
      s"/Prev $oldXref >>\nstartxref\n$xrefOff\n%%EOF\n")
      .getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  test("incremental update: newest object wins, older content intact") {
    val pdf = Pdf.write(spec(Seq(Seq("hello", "world"))))
    val infoNum = "/Info (\\d+) 0 R".r
      .findFirstMatchIn(new String(pdf, "ISO-8859-1")).get.group(1).toInt
    val updated = withUpdate(pdf, infoNum, Some(
      "<< /Title (Updated) /Author (A2) /Producer (P) " +
        "/CreationDate (D:20250101000000) >>"))
    val m = Pdf.meta(updated).get
    assert(m.title == "Updated" && m.author == "A2" && m.xrefOk)
    // text objects come from the ORIGINAL generation, still live
    assert(Pdf.extractText(updated).contains("hello\nworld"))
    // a second update on top of the first (2-link /Prev chain)
    val twice = withUpdate(updated, infoNum,
      Some("<< /Title (Again) >>"))
    assert(Pdf.meta(twice).get.title == "Again")
    assert(Pdf.extractText(twice).contains("hello\nworld"))
  }

  test("incremental deletion: a free entry shadows the older object") {
    val pdf = Pdf.write(spec(Seq(Seq("keep"))))
    val infoNum = "/Info (\\d+) 0 R".r
      .findFirstMatchIn(new String(pdf, "ISO-8859-1")).get.group(1).toInt
    val deleted = withUpdate(pdf, infoNum, None)
    val m = Pdf.meta(deleted).get
    assert(m.title == "" && m.author == "") // Info now a dangling ref
    assert(Pdf.extractText(deleted).contains("keep"))
  }

  test("/Prev cycle fails closed") {
    val pdf = Pdf.write(spec(Seq(Seq("x"))))
    val s = new String(pdf, "ISO-8859-1")
    val xrefOff = s.substring(s.lastIndexOf("startxref") + 9)
      .trim.split("\\s+")(0).toInt
    // point the trailer's chain at ITSELF
    val cyc = s.replace("/Size", s"/Prev $xrefOff /Size")
    assert(Pdf.parse(cyc.getBytes("ISO-8859-1")).isEmpty)
  }

  test("lying /Length (and the offset shift it causes) fails closed") {
    val pdf = Pdf.write(spec(Seq(Seq("abc")), flate = false))
    val s = new String(pdf, "ISO-8859-1")
    val inflated = s.replaceFirst("/Length \\d+", "/Length 999999999")
    assert(Pdf.extractText(inflated.getBytes("ISO-8859-1")).isEmpty)
  }

  test("pdfMeta + pdfTexts stages over a mixed frame") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      (1L, Pdf.write(spec(Seq(Seq("alpha", "beta")))), "application/pdf"),
      (2L, "not a pdf".getBytes("UTF-8"), "text/plain")))
      .toDF("doc_id", "bytes", "mime")
    val metas = Pdf.pdfMeta(media)
      .select("doc_id", "n_pages", "title")
      .as[(Long, Long, String)].collect().toSeq
    assert(metas == Seq((1L, 1L, "T")))
    val texts = Pdf.pdfTexts(media).as[(Long, String)].collect().toSeq
    assert(texts == Seq((1L, "alpha\nbeta")))
  }

  test("LZWDecode matches the ISO 32000 §7.4.4 worked example") {
    // input 45×5 65 45×3 66 encodes (EarlyChange irrelevant at this
    // size) to 80 0B 60 50 22 0C 0C 85 01 — the spec's own vector
    val enc = Array(0x80, 0x0b, 0x60, 0x50, 0x22, 0x0c, 0x0c, 0x85, 0x01)
      .map(_.toByte)
    assert(Pdf.lzwDecode(enc, 1).map(_.toSeq).contains(
      Seq[Byte](45, 45, 45, 45, 45, 65, 45, 45, 45, 66)))
    // and the encoder twin reproduces the spec bytes exactly
    assert(Pdf.lzwEncode(Array[Byte](45, 45, 45, 45, 45, 65, 45, 45,
      45, 66)).toSeq == enc.toSeq)
  }

  test("LZW round-trips across code-width growth and table clears") {
    val rnd = new scala.util.Random(11)
    val big = Array.tabulate(300000)(_ => (rnd.nextInt(17) * 13).toByte)
    for (data <- Seq(Array.empty[Byte], Array.fill(5000)('a'.toByte),
        "mixed content 123 mixed content".getBytes("UTF-8"), big)) {
      val enc = Pdf.lzwEncode(data)
      assert(Pdf.lzwDecode(enc, 1).exists(_.sameElements(data)),
        s"len=${data.length}")
    }
    // a truncated stream (EOD gone) fails closed
    val enc = Pdf.lzwEncode("hello hello hello hello".getBytes("UTF-8"))
    assert(Pdf.lzwDecode(enc.dropRight(2), 1).isEmpty)
    // width-boundary sweep: all-distinct-byte inputs emit one code per
    // byte, so lengths around 254/766/1790 land the FINAL data code
    // exactly where the decoder (EarlyChange = 1) grows the width
    // before reading EOD — the encoder must write EOD at the grown
    // width (regression: lengths 256/257/1555-1558 used to fail)
    for (base <- Seq(254, 766, 1790); d <- -4 to 4; n = base + d) {
      val data = Array.tabulate(n)(i => (i % 251).toByte)
      assert(Pdf.lzwDecode(Pdf.lzwEncode(data), 1)
        .exists(_.sameElements(data)), s"boundary len=$n")
    }
    // garbage never throws
    for (_ <- 1 to 50)
      Pdf.lzwDecode(Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte), 1)
  }

  test("ASCIIHexDecode: pairs, whitespace, odd padding, EOD, garbage") {
    def d(s: String) = Pdf.asciiHexDecode(s.getBytes("US-ASCII"))
      .map(_.toSeq)
    assert(d("48656C6C6F>").contains("Hello".getBytes("US-ASCII").toSeq))
    assert(d("48 65\n6c6C\t 6f>").contains("Hello".getBytes("US-ASCII").toSeq))
    assert(d("7>").contains(Seq(0x70.toByte))) // odd final digit pads 0
    assert(d("48xx>").isEmpty) // non-hex, non-ws: malformed
    assert(d("4865").contains(Seq(0x48.toByte, 0x65.toByte))) // no EOD
    assert(d("48>ignored").contains(Seq(0x48.toByte))) // data past EOD
    assert(d(">").contains(Seq.empty[Byte]))
  }

  test("ASCII85Decode: spec vector, z groups, partial tail, garbage") {
    def d(s: String) = Pdf.ascii85Decode(s.getBytes("US-ASCII"))
      .map(_.toSeq)
    assert(d("9jqo^~>").contains("Man ".getBytes("US-ASCII").toSeq))
    assert(d("z~>").contains(Seq[Byte](0, 0, 0, 0)))
    assert(d(" 9jq\no^ ~>").contains("Man ".getBytes("US-ASCII").toSeq))
    // partial group: n chars keep n-1 bytes
    assert(d("9jqo~>").contains("Man".getBytes("US-ASCII").toSeq))
    assert(d("9jqo^9~>").isEmpty) // a lone trailing char is malformed
    assert(d("9jzqo^~>").isEmpty) // z mid-group
    assert(d("s8W-!~>").contains( // exactly 2^32 - 1: the legal max
      Seq(0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)))
    assert(d("s8W-\"~>").isEmpty) // one past it overflows
    assert(d("9jqo^").contains("Man ".getBytes("US-ASCII").toSeq)) // no EOD
    assert(d("9jq{^~>").isEmpty) // out-of-alphabet char
    // encoder twin round-trips arbitrary payloads incl. zero runs
    val rnd = new scala.util.Random(5)
    for (len <- Seq(0, 1, 2, 3, 4, 5, 63, 64, 65, 4096)) {
      val data = Array.fill(len)(rnd.nextInt(256).toByte)
      assert(Pdf.ascii85Decode(Pdf.a85Encode(data)).exists(_.sameElements(data)))
      val zeros = new Array[Byte](len)
      assert(Pdf.ascii85Decode(Pdf.a85Encode(zeros)).exists(_.sameElements(zeros)))
    }
  }

  test("RunLengthDecode: spec tokens, EOD, truncation, bombs") {
    def d(b: Int*) = Pdf.runLengthDecode(b.map(_.toByte).toArray)
      .map(_.toSeq)
    // literal: L=2 copies 3 bytes; repeat: L=254 repeats 257-254=3×
    assert(d(2, 'a', 'b', 'c', 128).contains(Seq[Byte]('a', 'b', 'c')))
    assert(d(254, 'x', 128).contains(Seq[Byte]('x', 'x', 'x')))
    // mixed + data past EOD ignored
    assert(d(0, 'q', 255, 'r', 128, 99, 99)
      .contains(Seq[Byte]('q', 'r', 'r')))
    // missing EOD tolerated; truncation mid-token malformed
    assert(d(1, 'a', 'b').contains(Seq[Byte]('a', 'b')))
    assert(d(2, 'a', 'b').isEmpty) // literal claims 3, has 2
    assert(d(253).isEmpty) // repeat with no byte
    // encoder twin round-trips runs, literals, and 128-caps
    val rnd = new scala.util.Random(7)
    for (data <- Seq(Array.empty[Byte], Array.fill(1000)('z'.toByte),
        Array.tabulate(300)(i => (i % 251).toByte),
        Array.fill(5000)(rnd.nextInt(3).toByte))) {
      val enc = Pdf.rleEncode(data)
      assert(Pdf.runLengthDecode(enc).exists(_.sameElements(data)),
        s"len=${data.length}")
    }
  }

  test("content filters: lzw / ahx / a85 / rle / chains round-trip in both layouts") {
    val pages = Seq(Seq("filter test page", "second chunk here"))
    for (f <- Seq("none", "flate", "lzw", "ahx", "a85", "rle",
        "ahx+flate", "a85+flate");
        modern <- Seq(false, true)) {
      val pdf = Pdf.write(spec(pages, modern = modern)
        .copy(contentFilter = f))
      assert(Pdf.extractText(pdf)
        .contains("filter test page\nsecond chunk here"),
        s"filter=$f modern=$modern")
    }
    // an image filter still fails closed rather than misreads
    val dct = new String(Pdf.write(spec(pages).copy(contentFilter = "none")),
      "ISO-8859-1").replaceFirst("<< /Length (\\d+) >>",
      "<< /Length $1 /Filter /DCTDecode >>")
    assert(Pdf.extractText(dct.getBytes("ISO-8859-1")).isEmpty)
  }

  test("synthetic corpus spec: text round-trips at the 48-char rule") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      (java.lang.Long.valueOf(1L), "short"),
      (java.lang.Long.valueOf(2L), "x" * 300), // multi-page at 5×48=240
      (java.lang.Long.valueOf(3L), "word " * 60)))
    val media = Pdf.syntheticPdfMedia(docs)
    val texts = Pdf.pdfTexts(media).as[(Long, String)]
      .collect().toMap
    def expected(t: String) =
      (if (t.isEmpty) Seq("") else t.grouped(48).toSeq).mkString("\n")
    assert(texts(1L) == expected("short"))
    assert(texts(2L) == expected("x" * 300))
    assert(texts(3L) == expected("word " * 60))
    val metas = Pdf.pdfMeta(media)
      .as[(Long, String, Long, String, String, String, String, Boolean,
        Boolean)]
      .collect().map(k => k._1 -> k).toMap
    // 300 chars → 7 chunks → 2 pages
    assert(metas(2L)._3 == 2L && metas(2L)._8 && !metas(2L)._9)
  }

  test("encrypted documents witness as encrypted instead of vanishing") {
    val pages = Seq(Seq("secret page"))
    for (modern <- Seq(false, true)) {
      val pdf = Pdf.write(spec(pages, modern = modern)
        .copy(encrypt = true))
      // parse/meta/text fail closed — ciphertext must never misread
      assert(Pdf.parse(pdf).isEmpty && Pdf.meta(pdf).isEmpty &&
        Pdf.extractText(pdf).isEmpty, s"modern=$modern")
      assert(Pdf.isEncrypted(pdf), s"modern=$modern")
      // and a plain doc is NOT flagged
      assert(!Pdf.isEncrypted(Pdf.write(spec(pages, modern = modern))))
    }
    // the Spark stage surfaces the row with header version + flag
    import spark.implicits._
    // id 7 ≡ 7 (mod 17) → encrypted; ids 1, 2 plain
    val docs = spark.createDataset(Seq(1L, 2L, 7L)
      .map(i => (java.lang.Long.valueOf(i), s"text $i")))
    val rows = Pdf.pdfMeta(Pdf.syntheticPdfMedia(docs))
      .as[(Long, String, Long, String, String, String, String, Boolean,
        Boolean)]
      .collect().map(k => k._1 -> k).toMap
    assert(rows.size == 3)
    assert(!rows(1L)._9 && !rows(2L)._9)
    assert(rows(7L)._9 && rows(7L)._2 == "1.4" && rows(7L)._3 == 0L &&
      rows(7L)._4 == "" && !rows(7L)._8)
    // text extraction drops only the encrypted doc
    assert(Pdf.pdfTexts(Pdf.syntheticPdfMedia(docs)).count() == 2)
  }
}
