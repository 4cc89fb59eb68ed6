package graft.ext

import java.util.zip.{Deflater, Inflater}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}

/** PDF metadata + text extraction — PDFs are a first-class source in
  * real training-data pipelines, and the extraction path here is the
  * real thing: classic cross-reference table, indirect-object
  * resolution, FlateDecode (zlib) content streams through
  * `java.util.zip.Inflater`, and a content-stream interpreter for the
  * text-showing operators (`Tj`, `TJ`, `'`, `"`) with literal-string
  * escapes, hex strings, and line-move (`Td`/`TD`/`T*`) newline
  * heuristics (ISO 32000-1 §7 syntax, §9.4 text objects).
  *
  * Executor contract shared with every pure-byte parser here: hostile,
  * truncated, or cyclic input fails CLOSED (None), never throws, and
  * every count/offset/inflate is bounded before allocation.
  *
  * Scope: classic xref tables (what the muxer twin writes and what
  * pre-1.5 producers emit), INCLUDING incremental-update /Prev chains
  * (newest section wins, free entries shadow older in-use ones, cycle
  * and chain-length guarded). Cross-reference STREAMS, encryption,
  * and non-Flate filters fail closed — a production extension point,
  * not a correctness hole: the parser refuses rather than misreads.
  */
object Pdf {

  // ------------------------------------------------------------------
  // object model
  // ------------------------------------------------------------------
  sealed trait Obj
  final case class PNum(v: Double) extends Obj
  final case class PName(s: String) extends Obj
  final case class PStr(bytes: Array[Byte]) extends Obj
  final case class PArr(items: Vector[Obj]) extends Obj
  final case class PDict(m: Map[String, Obj]) extends Obj
  final case class PRef(num: Int) extends Obj
  final case class PBool(v: Boolean) extends Obj
  case object PNull extends Obj
  final case class PStream(dict: PDict, data: Array[Byte]) extends Obj

  /** A parsed document: header version, trailer dict, xref offsets,
    * and whether every in-use xref entry pointed at a header whose
    * object number agreed (the `xref_ok` witness).
    */
  final case class Doc(raw: Array[Byte], version: String,
      trailer: Map[String, Obj], offsets: Map[Int, Int], xrefOk: Boolean) {

    private val cache = mutable.Map.empty[Int, Option[Obj]]
    private val resolving = mutable.Set.empty[Int]

    /** Parse object `num` at its xref offset (memoized, cycle-safe). */
    def obj(num: Int): Option[Obj] = cache.getOrElseUpdate(num, {
      if (resolving.contains(num)) None // reference cycle
      else offsets.get(num).flatMap { off =>
        resolving += num
        try parseIndirectAt(this, off, num)
        finally resolving -= num
      }
    })

    /** Follow references to a ground value (depth-capped). */
    def deref(o: Obj, depth: Int = 0): Option[Obj] =
      if (depth > 16) None
      else o match {
        case PRef(n) => obj(n).flatMap(deref(_, depth + 1))
        case other => Some(other)
      }
  }

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'

  private final val MaxInflateBytes = 1 << 26
  private final val MaxPages = 10000

  // ------------------------------------------------------------------
  // lexer (PDF §7.2: whitespace NUL TAB LF FF CR SP; delimiters
  // ( ) < > [ ] { } / %)
  // ------------------------------------------------------------------
  private def isWs(c: Int): Boolean =
    c == 0 || c == 9 || c == 10 || c == 12 || c == 13 || c == 32
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' ||
      c == ']' || c == '{' || c == '}' || c == '/' || c == '%'

  private final class Lexer(val b: Array[Byte], var pos: Int) {
    def peek: Int = if (pos >= 0 && pos < b.length) b(pos) & 0xff else -1
    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (isWs(peek)) pos += 1
        if (peek == '%') { // comment to EOL
          while (peek != -1 && peek != '\n' && peek != '\r') pos += 1
        } else go = false
      }
    }
    /** Next regular token (run of non-ws non-delim chars). */
    def word(): String = {
      skipWs()
      val start = pos
      while (peek != -1 && !isWs(peek) && !isDelim(peek)) pos += 1
      new String(b, start, pos - start, "US-ASCII")
    }
    def expect(w: String): Boolean = word() == w
    def int(): Option[Long] = {
      val w = word()
      if (w.nonEmpty && w.forall(c => c.isDigit || c == '-' || c == '+'))
        w.toLongOption
      else None
    }
  }

  /** Literal string after the opening '(': balanced parens, escapes
    * \n \r \t \b \f \( \) \\ \ooo and backslash-EOL continuation.
    */
  private def literalString(lex: Lexer): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var depth = 1
    while (depth > 0) {
      val c = lex.peek
      if (c == -1) return None
      lex.pos += 1
      c match {
        case '(' => depth += 1; out.write('(')
        case ')' => depth -= 1; if (depth > 0) out.write(')')
        case '\\' =>
          val e = lex.peek
          if (e == -1) return None
          lex.pos += 1
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '\n' => () // continuation
            case '\r' => if (lex.peek == '\n') lex.pos += 1
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && lex.peek >= '0' && lex.peek <= '7') {
                v = v * 8 + (lex.peek - '0'); lex.pos += 1; k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other)
          }
        case other => out.write(other)
      }
    }
    Some(out.toByteArray)
  }

  /** Hex string after the opening '<': pairs of hex digits, odd final
    * digit padded with 0, whitespace ignored.
    */
  private def hexString(lex: Lexer): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    while (true) {
      val c = lex.peek
      if (c == -1) return None
      lex.pos += 1
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        return Some(out.toByteArray)
      } else if (!isWs(c)) {
        val d = Character.digit(c, 16)
        if (d < 0) return None
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
    }
    None // unreachable
  }

  private def name(lex: Lexer): String = {
    // after the '/': regular chars, #xx hex escapes
    val sb = new StringBuilder
    while (lex.peek != -1 && !isWs(lex.peek) && !isDelim(lex.peek)) {
      val c = lex.peek; lex.pos += 1
      if (c == '#' && lex.pos + 1 < lex.b.length) {
        val h = Character.digit(lex.b(lex.pos) & 0xff, 16)
        val l = Character.digit(lex.b(lex.pos + 1) & 0xff, 16)
        if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); lex.pos += 2 }
        else sb.append(c.toChar)
      } else sb.append(c.toChar)
    }
    sb.toString
  }

  /** One value at the cursor. Depth-capped; None on malformed. */
  private def value(lex: Lexer, depth: Int): Option[Obj] = {
    if (depth > 32) return None
    lex.skipWs()
    lex.peek match {
      case -1 => None
      case '/' => lex.pos += 1; Some(PName(name(lex)))
      case '(' => lex.pos += 1; literalString(lex).map(PStr.apply)
      case '[' =>
        lex.pos += 1
        val items = Vector.newBuilder[Obj]
        var n = 0
        while ({ lex.skipWs(); lex.peek != ']' }) {
          if (lex.peek == -1 || n > 65536) return None
          value(lex, depth + 1) match {
            case Some(v) => items += v; n += 1
            case None => return None
          }
        }
        lex.pos += 1
        Some(PArr(items.result()))
      case '<' =>
        if (lex.pos + 1 < lex.b.length && lex.b(lex.pos + 1) == '<') {
          lex.pos += 2
          val m = Map.newBuilder[String, Obj]
          var n = 0
          while ({ lex.skipWs()
            !(lex.peek == '>' && lex.pos + 1 < lex.b.length &&
              lex.b(lex.pos + 1) == '>') }) {
            if (lex.peek != '/' || n > 65536) return None
            lex.pos += 1
            val k = name(lex)
            value(lex, depth + 1) match {
              case Some(v) => m += (k -> v); n += 1
              case None => return None
            }
          }
          lex.pos += 2
          Some(PDict(m.result()))
        } else { lex.pos += 1; hexString(lex).map(PStr.apply) }
      case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
        val w = lex.word()
        val num = w.toDoubleOption.getOrElse(return None)
        // integer may open an indirect reference: "num gen R"
        if (num >= 0 && num == num.floor && !w.contains('.')) {
          val save = lex.pos
          val l2 = lex.int()
          if (l2.exists(_ >= 0) && { lex.skipWs(); lex.peek == 'R' } && {
            val after = lex.pos + 1
            after >= lex.b.length || isWs(lex.b(after) & 0xff) ||
              isDelim(lex.b(after) & 0xff)
          }) {
            lex.pos += 1
            return Some(PRef(num.toInt))
          }
          lex.pos = save
        }
        Some(PNum(num))
      case _ =>
        lex.word() match {
          case "true" => Some(PBool(true))
          case "false" => Some(PBool(false))
          case "null" => Some(PNull)
          case _ => None
        }
    }
  }

  /** "num gen obj <value> [stream...endstream] endobj" at `off`. */
  private def parseIndirectAt(doc: Doc, off: Int, expectNum: Int)
      : Option[Obj] = {
    if (off < 0 || off >= doc.raw.length) return None
    val lex = new Lexer(doc.raw, off)
    val n = lex.int().getOrElse(return None)
    if (n != expectNum) return None
    lex.int().getOrElse(return None) // generation
    if (!lex.expect("obj")) return None
    val v = value(lex, 0).getOrElse(return None)
    lex.skipWs()
    val save = lex.pos
    if (lex.word() == "stream") {
      val dict = v match { case d: PDict => d; case _ => return None }
      // keyword is followed by CRLF or LF (spec: not bare CR)
      if (lex.peek == '\r') lex.pos += 1
      if (lex.peek == '\n') lex.pos += 1 else return None
      val len = dict.m.get("Length").flatMap {
        case PNum(x) => Some(x.toLong)
        case r: PRef => doc.deref(r).collect { case PNum(x) => x.toLong }
        case _ => None
      }.getOrElse(return None)
      if (len < 0 || lex.pos + len > doc.raw.length) return None
      val data = java.util.Arrays.copyOfRange(doc.raw,
        lex.pos, (lex.pos + len).toInt)
      lex.pos = (lex.pos + len).toInt
      if (!lex.expect("endstream")) return None
      Some(PStream(dict, data))
    } else { lex.pos = save; Some(v) }
  }

  // ------------------------------------------------------------------
  // xref + trailer
  // ------------------------------------------------------------------

  /** One classic xref section at `off`: (entries as (num, offset,
    * inUse), trailer dict). None on malformation or an xref STREAM.
    */
  private def parseXrefSection(bytes: Array[Byte], off: Int)
      : Option[(List[(Int, Int, Boolean)], Map[String, Obj])] = {
    val lex = new Lexer(bytes, off)
    if (lex.word() != "xref") return None // xref STREAM → fail closed
    var entries = List.empty[(Int, Int, Boolean)]
    var entriesSeen = 0L
    var done = false
    while (!done) {
      lex.skipWs()
      val save = lex.pos
      val w = lex.word()
      if (w == "trailer") done = true
      else {
        lex.pos = save
        val start = lex.int().getOrElse(return None)
        val count = lex.int().getOrElse(return None)
        // each entry is ~20 bytes on disk: the declared count cannot
        // exceed what the remaining extent physically holds
        if (start < 0 || count < 0 ||
            count > (bytes.length - lex.pos) / 18) return None
        var i = 0L
        while (i < count) {
          val eoff = lex.int().getOrElse(return None)
          lex.int().getOrElse(return None) // generation
          val kind = lex.word()
          val num = (start + i).toInt
          if (kind == "n") {
            if (eoff >= 0 && eoff < bytes.length)
              entries ::= ((num, eoff.toInt, true))
            else return None
          } else if (kind == "f") {
            // a FREE entry still claims the number: a newer update's
            // deletion must shadow an older in-use entry
            entries ::= ((num, -1, false))
          } else return None
          entriesSeen += 1
          if (entriesSeen > bytes.length / 18 + 8) return None
          i += 1
        }
      }
    }
    value(lex, 0) match {
      case Some(PDict(m)) => Some((entries.reverse, m))
      case _ => None
    }
  }

  /** Maximum incremental-update generations followed before failing
    * closed (real documents carry a handful; hundreds is hostile).
    */
  private final val MaxPrevChain = 64

  /** Parse header, startxref, and the classic xref table INCLUDING
    * incremental-update chains: trailer /Prev links walk newest →
    * oldest, newer sections shadow older ones (including deletions via
    * free entries), and /Root · /Info come from the NEWEST trailer.
    * Fail closed (None) on: xref streams, encryption, /Prev cycles or
    * chains past [[MaxPrevChain]], malformed anything.
    */
  def parse(bytes: Array[Byte]): Option[Doc] = {
    if (!isPdf(bytes)) return None
    var v = 5
    while (v < bytes.length && !isWs(bytes(v) & 0xff)) v += 1
    val version = new String(bytes, 5, v - 5, "US-ASCII")
    // startxref: scan the tail (a valid trailer sits in the last KiB;
    // give slack for fuzz)
    val tail = new String(bytes, math.max(0, bytes.length - 2048),
      math.min(2048, bytes.length), "ISO-8859-1")
    val sx = tail.lastIndexOf("startxref")
    if (sx < 0) return None
    val lex0 = new Lexer(bytes, math.max(0, bytes.length - 2048) + sx + 9)
    val xrefOff = lex0.int().getOrElse(return None)
    if (xrefOff < 0 || xrefOff >= bytes.length) return None

    val claimed = mutable.Set.empty[Int] // newest-first: first claim wins
    val offsets = mutable.Map.empty[Int, Int]
    var inUse = List.empty[(Int, Int)]
    var newestTrailer: Map[String, Obj] = null
    val visited = mutable.Set.empty[Long]
    var cur = xrefOff
    while (cur >= 0) {
      if (visited.contains(cur) || visited.size >= MaxPrevChain ||
          cur >= bytes.length) return None // cycle / hostile chain
      visited += cur
      val (entries, trailer) =
        parseXrefSection(bytes, cur.toInt).getOrElse(return None)
      if (trailer.contains("XRefStm") || trailer.contains("Encrypt"))
        return None
      for ((num, off, used) <- entries if !claimed.contains(num)) {
        claimed += num
        if (used) { offsets += (num -> off); inUse ::= ((num, off)) }
      }
      if (newestTrailer == null) newestTrailer = trailer
      cur = trailer.get("Prev") match {
        case Some(PNum(p)) if p >= 0 => p.toLong
        case Some(_) => return None
        case None => -1L
      }
    }
    // xref_ok witness: every live offset must carry a header whose
    // object number agrees
    val xrefOk = inUse.forall { case (num, off) =>
      new Lexer(bytes, off).int().contains(num.toLong)
    }
    Some(Doc(bytes, version, newestTrailer, offsets.toMap, xrefOk))
  }

  /** Inflate a zlib (FlateDecode) stream with hard output caps. */
  private def inflateAll(data: Array[Byte]): Option[Array[Byte]] = {
    val cap = math.min(MaxInflateBytes.toLong,
      data.length.toLong * 1032 + 64).toInt
    val inf = new Inflater() // FlateDecode IS zlib-wrapped (RFC 1950)
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.min(8192, cap))
      val buf = new Array[Byte](8192)
      var spin = 0
      while (!inf.finished() && spin < (1 << 20)) {
        spin += 1
        val n =
          try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => return None }
        if (n == 0 && !inf.finished() &&
            (inf.needsInput() || inf.needsDictionary())) return None
        if (out.size() + n > cap) return None
        out.write(buf, 0, n)
      }
      if (!inf.finished()) return None
      Some(out.toByteArray)
    } finally inf.end()
  }

  /** Stream payload after filters: none, or /Filter /FlateDecode
    * (name or single-element array). Anything else fails closed.
    */
  private def streamData(doc: Doc, s: PStream): Option[Array[Byte]] =
    s.dict.m.get("Filter").map(f => doc.deref(f).getOrElse(return None)) match {
      case None => Some(s.data)
      case Some(PName("FlateDecode")) => inflateAll(s.data)
      case Some(PArr(Vector(PName("FlateDecode")))) => inflateAll(s.data)
      case Some(PArr(Vector())) => Some(s.data)
      case _ => None
    }

  // ------------------------------------------------------------------
  // metadata
  // ------------------------------------------------------------------
  final case class PdfMeta(version: String, nPages: Long, title: String,
      author: String, producer: String, created: String, xrefOk: Boolean)

  /** PDFDocEncoding ≈ Latin-1 for the ASCII range; UTF-16BE with BOM
    * per the spec's other branch.
    */
  private def textString(o: Obj): String = o match {
    case PStr(b) if b.length >= 2 && (b(0) & 0xff) == 0xfe &&
        (b(1) & 0xff) == 0xff =>
      new String(b, 2, b.length - 2, "UTF-16BE")
    case PStr(b) => new String(b, "ISO-8859-1")
    case _ => ""
  }

  def meta(bytes: Array[Byte]): Option[PdfMeta] =
    parse(bytes).flatMap { doc =>
      val root = doc.trailer.get("Root").flatMap(doc.deref(_)) match {
        case Some(PDict(m)) => m
        case _ => return None
      }
      val nPages = root.get("Pages").flatMap(doc.deref(_)) match {
        case Some(PDict(pm)) => pm.get("Count").flatMap(doc.deref(_)) match {
          case Some(PNum(n)) if n >= 0 && n <= MaxPages => n.toLong
          case _ => return None
        }
        case _ => return None
      }
      val info = doc.trailer.get("Info").flatMap(doc.deref(_)) match {
        case Some(PDict(m)) => m
        case _ => Map.empty[String, Obj]
      }
      def field(k: String): String =
        info.get(k).flatMap(doc.deref(_)).map(textString).getOrElse("")
      Some(PdfMeta(doc.version, nPages, field("Title"), field("Author"),
        field("Producer"), field("CreationDate"), doc.xrefOk))
    }

  // ------------------------------------------------------------------
  // text extraction
  // ------------------------------------------------------------------

  /** Page dicts in reading order: depth-capped /Pages → /Kids walk. */
  private def collectPages(doc: Doc, node: Obj, depth: Int,
      acc: mutable.ArrayBuffer[Map[String, Obj]]): Boolean = {
    if (depth > 32 || acc.size > MaxPages) return false
    doc.deref(node) match {
      case Some(PDict(m)) => m.get("Type") match {
        case Some(PName("Pages")) =>
          m.get("Kids").flatMap(doc.deref(_)) match {
            case Some(PArr(kids)) =>
              kids.forall(k => collectPages(doc, k, depth + 1, acc))
            case _ => false
          }
        case Some(PName("Page")) => acc += m; true
        case _ => false
      }
      case _ => false
    }
  }

  /** Interpret one content stream's text operators. Newline heuristic:
    * a line move (`Td`/`TD`/`T*`, and the implicit one in `'`/`"`)
    * AFTER text has been shown emits '\n'; shown bytes decode as UTF-8
    * (the muxer twin's convention; ASCII content is encoding-neutral).
    */
  private def pageText(content: Array[Byte]): String = {
    val lex = new Lexer(content, 0)
    val out = new StringBuilder
    var shownSinceBreak = false
    var lastStr: Array[Byte] = null
    var arr: mutable.ArrayBuffer[Array[Byte]] = null
    var lastArr: Seq[Array[Byte]] = Nil
    def break(): Unit =
      if (shownSinceBreak) { out.append('\n'); shownSinceBreak = false }
    def show(b: Array[Byte]): Unit = {
      out.append(new String(b, java.nio.charset.StandardCharsets.UTF_8))
      shownSinceBreak = true
    }
    var steps = 0
    while (lex.peek != -1 && steps < (1 << 22)) {
      steps += 1
      lex.skipWs()
      lex.peek match {
        case -1 => ()
        case '(' =>
          lex.pos += 1
          literalString(lex) match {
            case Some(b) => if (arr != null) arr += b else lastStr = b
            case None => return out.toString // malformed tail: keep prefix
          }
        case '<' if lex.pos + 1 < content.length &&
            content(lex.pos + 1) == '<' =>
          // inline dict (e.g. BDC properties): skip structurally
          if (value(lex, 0).isEmpty) return out.toString
        case '<' =>
          lex.pos += 1
          hexString(lex) match {
            case Some(b) => if (arr != null) arr += b else lastStr = b
            case None => return out.toString
          }
        case '[' => lex.pos += 1; arr = mutable.ArrayBuffer.empty
        case ']' =>
          lex.pos += 1
          if (arr != null) { lastArr = arr.toSeq; arr = null }
        case '/' => lex.pos += 1; name(lex); ()
        case c if isDelim(c) => lex.pos += 1 // { } > stray delimiters
        case _ =>
          lex.word() match {
            case "Tj" => if (lastStr != null) show(lastStr)
            case "TJ" => lastArr.foreach(show); lastArr = Nil
            case "'" => break(); if (lastStr != null) show(lastStr)
            case "\"" => break(); if (lastStr != null) show(lastStr)
            case "Td" | "TD" | "T*" => break()
            case "" => lex.pos += 1 // defensive: never stall
            case _ => () // other operators and numeric operands
          }
      }
    }
    out.toString
  }

  /** Whole-document text: pages in Kids order, each page's /Contents
    * (single stream or array) concatenated then interpreted; pages
    * joined with '\n'. None if the document or any page fails closed.
    */
  def extractText(bytes: Array[Byte]): Option[String] =
    parse(bytes).flatMap { doc =>
      val root = doc.trailer.get("Root").flatMap(doc.deref(_)) match {
        case Some(PDict(m)) => m
        case _ => return None
      }
      val pagesNode = root.getOrElse("Pages", return None)
      val pages = mutable.ArrayBuffer.empty[Map[String, Obj]]
      if (!collectPages(doc, pagesNode, 0, pages)) return None
      val texts = pages.map { pg =>
        val streams: Seq[Obj] = pg.get("Contents") match {
          case Some(PArr(items)) => items
          case Some(one) => Seq(one)
          case None => Seq.empty
        }
        val parts = streams.map { s =>
          doc.deref(s) match {
            case Some(ps: PStream) => streamData(doc, ps).getOrElse(return None)
            case _ => return None
          }
        }
        val joined = new java.io.ByteArrayOutputStream()
        parts.foreach { p => joined.write(p); joined.write('\n') }
        pageText(joined.toByteArray)
      }
      Some(texts.mkString("\n"))
    }

  // ------------------------------------------------------------------
  // muxer twin
  // ------------------------------------------------------------------

  /** @param pages     page → chunks; each chunk becomes one show op
    * @param seed      drives the chunk encoding rotation (literal /
    *                  hex / TJ split) so every path is exercised
    * @param flate     FlateDecode the content streams
    */
  final case class BuildSpec(pages: Seq[Seq[String]], title: String,
      author: String, producer: String, created: String,
      seed: Long = 0L, flate: Boolean = true)

  private def escapeLiteral(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def hexOf(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater() // zlib wrapper — FlateDecode's framing
    try {
      d.setInput(data)
      d.finish()
      val buf = new Array[Byte](math.max(64, data.length * 2 + 64))
      val bos = new java.io.ByteArrayOutputStream()
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      bos.toByteArray
    } finally d.end()
  }

  /** Deterministic classic-xref PDF: catalog, page tree, Helvetica
    * resource, one content stream per page (chunk c of a page shown as
    * literal Tj / hex Tj / two-part TJ array by (seed + c) % 3, lines
    * separated by `0 -14 Td`), Info dict, correct 10-digit xref.
    */
  def write(spec: BuildSpec): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    def wb(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    w("%PDF-1.4\n%âãÏÓ\n")
    val nPages = spec.pages.size
    // object numbers: 1 catalog, 2 pages, 3 font, then per page i
    // (0-based): page 4+2i, contents 5+2i; info last
    val infoNum = 4 + 2 * nPages
    val offsets = new Array[Long](infoNum + 1)
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = bos.size().toLong
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2) {
      val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
      w(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>")
    }
    obj(3)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    for ((chunks, i) <- spec.pages.zipWithIndex) {
      obj(4 + 2 * i)(w(s"<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents ${5 + 2 * i} 0 R >>"))
      val content = new StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n")
      for ((chunk, c) <- chunks.zipWithIndex) {
        if (c > 0) content.append("0 -14 Td\n")
        (spec.seed + c) % 3 match {
          case 0 => content.append(s"(${escapeLiteral(chunk)}) Tj\n")
          case 1 => content.append(s"<${hexOf(chunk)}> Tj\n")
          case _ =>
            val half = chunk.length / 2
            content.append(s"[(${escapeLiteral(chunk.take(half))}) -250 " +
              s"(${escapeLiteral(chunk.drop(half))})] TJ\n")
        }
      }
      content.append("ET")
      val raw = content.toString.getBytes("UTF-8")
      val (data, filter) =
        if (spec.flate) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      obj(5 + 2 * i) {
        w(s"<< /Length ${data.length}$filter >>\nstream\n")
        wb(data)
        w("\nendstream")
      }
    }
    obj(infoNum)(w(s"<< /Title (${escapeLiteral(spec.title)}) " +
      s"/Author (${escapeLiteral(spec.author)}) " +
      s"/Producer (${escapeLiteral(spec.producer)}) " +
      s"/CreationDate (${escapeLiteral(spec.created)}) >>"))
    val xrefOff = bos.size().toLong
    w(s"xref\n0 ${infoNum + 1}\n")
    w("0000000000 65535 f \n")
    for (n <- 1 to infoNum) w(f"${offsets(n)}%010d 00000 n \n")
    w(s"trailer\n<< /Size ${infoNum + 1} /Root 1 0 R /Info $infoNum 0 R >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark stages (parse in mapPartitions — byte-level work — zero
  // shuffle; non-PDF / failed-closed payloads contribute nothing)
  // ------------------------------------------------------------------

  def pdfMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        meta(b).map(m => (id, m.version, m.nPages, m.title, m.author,
          m.producer, m.created, m.xrefOk))
      }).toDF("doc_id", "version", "n_pages", "title", "author",
        "producer", "created", "xref_ok")
  }

  def pdfTexts(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        extractText(b).map(t => (id, t))
      }).toDF("doc_id", "pdf_text")
  }

  /** One deterministic PDF per document holding its ACTUAL text: 48-char
    * chunks, 5 chunks per page, Flate for odd ids, Info fields in
    * closed form — q_pdf_meta/q_pdf_text recompute everything, and the
    * text round trip (source column → content streams → extraction) is
    * exact by the uniform '\n'-every-48-chars rule (page joins land on
    * chunk boundaries).
    */
  def syntheticPdfMedia(docs: Dataset[(java.lang.Long, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (boxed, text) =>
      val id = boxed.longValue()
      val chunks =
        if (text.isEmpty) Seq("") else text.grouped(48).toSeq
      val pages = chunks.grouped(5).toSeq
      val created = f"D:${2000 + id % 22}%04d${1 + id % 12}%02d" +
        f"${1 + id % 28}%02d${id % 24}%02d${id % 60}%02d${id % 60}%02d"
      val pdf = write(BuildSpec(pages, title = s"Doc $id",
        author = s"Author${id % 5}", producer = "graft-pdf 1.0",
        created = created, seed = id, flate = id % 2 == 1))
      (id, pdf, "application/pdf")
    }).toDF("doc_id", "bytes", "mime")
  }
}
