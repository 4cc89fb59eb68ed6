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
  * Scope: classic xref tables AND PDF 1.5 cross-reference streams +
  * /Type /ObjStm object streams (the post-2007 producer layout),
  * INCLUDING incremental-update /Prev chains (newest section wins,
  * free entries shadow older in-use ones, cycle and chain-length
  * guarded). Stream filters: FlateDecode, LZWDecode, ASCIIHexDecode,
  * ASCII85Decode — singly or chained — with PNG predictors.
  * Encryption, hybrid XRefStm files, and the image filters
  * (DCT/JPX/CCITT/JBIG2) fail closed — the parser refuses rather
  * than misreads.
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

  /** A parsed document: header version, trailer dict, xref offsets
    * (direct objects), compressed locations (objects living inside an
    * object stream, PDF 1.5+), and whether every in-use xref entry
    * pointed at a header whose object number agreed (the `xref_ok`
    * witness).
    */
  final case class Doc(raw: Array[Byte], version: String,
      trailer: Map[String, Obj], offsets: Map[Int, Int],
      compressed: Map[Int, (Int, Int)], xrefOk: Boolean) {

    private val cache = mutable.Map.empty[Int, Option[Obj]]
    private val resolving = mutable.Set.empty[Int]
    // decoded /Type /ObjStm payloads: num → (member pairs, data, First)
    private val stmCache =
      mutable.Map.empty[Int, Option[(Vector[(Int, Int)], Array[Byte], Int)]]

    /** Parse object `num` at its xref offset, or out of its object
      * stream for compressed entries (memoized, cycle-safe).
      */
    def obj(num: Int): Option[Obj] = cache.getOrElseUpdate(num, {
      // `resolving` stops CYCLES; its size is also the live resolution
      // depth, which caps hostile type-2 chains (obj k inside stream
      // k+1 inside stream k+2 ...) that would otherwise overflow the
      // JVM stack without ever revisiting a number
      if (resolving.contains(num) || resolving.size >= 32) None
      else {
        resolving += num
        try offsets.get(num)
          .flatMap(off => parseIndirectAt(this, off, num))
          .orElse(compressed.get(num).flatMap { case (stm, _) =>
            objStm(stm).flatMap { case (pairs, data, first) =>
              pairs.find(_._1 == num).flatMap { case (_, off) =>
                val at = first.toLong + off
                if (off < 0 || at >= data.length) None
                else value(new Lexer(data, at.toInt), 0)
              }
            }
          })
        finally resolving -= num
      }
    })

    /** Decode an object stream: (member (num, offset) pairs, payload,
      * /First). None unless it really is a well-formed /Type /ObjStm.
      */
    private def objStm(stm: Int)
        : Option[(Vector[(Int, Int)], Array[Byte], Int)] =
      stmCache.getOrElseUpdate(stm, obj(stm) match {
        case Some(ps: PStream)
            if ps.dict.m.get("Type").contains(PName("ObjStm")) =>
          for {
            data <- streamData(this, ps)
            nN <- ps.dict.m.get("N").collect { case PNum(x) => x.toInt }
            first <- ps.dict.m.get("First").collect { case PNum(x) => x.toInt }
            if nN >= 0 && nN <= data.length && first >= 0 &&
              first <= data.length
            pairs <- {
              val lx = new Lexer(data, 0)
              val b = Vector.newBuilder[(Int, Int)]
              var ok = true
              var k = 0
              while (ok && k < nN) {
                (lx.int(), lx.int()) match {
                  case (Some(o), Some(off))
                      if o >= 0 && o <= Int.MaxValue &&
                        off >= 0 && off <= Int.MaxValue =>
                    b += ((o.toInt, off.toInt))
                  case _ => ok = false
                }
                k += 1
              }
              if (ok) Some(b.result()) else None
            }
          } yield (pairs, data, first)
        case _ => None
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

  // one xref row: a direct offset, a freed number, or a location
  // inside an object stream (xref-stream type 2)
  private sealed trait XEntry
  private final case class XUsed(off: Int) extends XEntry
  private case object XFree extends XEntry
  private final case class XInStream(stm: Int, idx: Int) extends XEntry

  /** One classic xref section at `off`: (entries, trailer dict).
    * None on malformation (an xref STREAM dispatches elsewhere).
    */
  private def parseXrefSection(bytes: Array[Byte], off: Int)
      : Option[(List[(Int, XEntry)], Map[String, Obj])] = {
    val lex = new Lexer(bytes, off)
    if (lex.word() != "xref") return None
    var entries = List.empty[(Int, XEntry)]
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
              entries ::= ((num, XUsed(eoff.toInt)))
            else return None
          } else if (kind == "f") {
            // a FREE entry still claims the number: a newer update's
            // deletion must shadow an older in-use entry
            entries ::= ((num, XFree))
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

  /** One cross-reference STREAM (PDF 1.5+, §7.5.8) at `off`: a
    * "num gen obj" carrying /Type /XRef whose decoded payload packs
    * binary rows of /W-field widths over the /Index subsections.
    * The stream must be self-describing (direct /Length and filter
    * params — nothing can resolve before the xref itself exists).
    */
  private def parseXrefStreamAt(bytes: Array[Byte], off: Int)
      : Option[(List[(Int, XEntry)], Map[String, Obj])] = {
    val lex = new Lexer(bytes, off)
    lex.int().getOrElse(return None) // object number
    lex.int().getOrElse(return None) // generation
    if (!lex.expect("obj")) return None
    val dict = value(lex, 0) match {
      case Some(PDict(m)) if m.get("Type").contains(PName("XRef")) => m
      case _ => return None
    }
    if (lex.word() != "stream") return None
    if (lex.peek == '\r') lex.pos += 1
    if (lex.peek == '\n') lex.pos += 1 else return None
    val len = dict.get("Length") match {
      case Some(PNum(x)) if x >= 0 => x.toLong
      case _ => return None // indirect /Length: nothing to resolve it yet
    }
    if (lex.pos + len > bytes.length) return None
    val data = java.util.Arrays.copyOfRange(bytes, lex.pos,
      (lex.pos + len).toInt)
    val payload = decodeStream(dict, data, o => Some(o))
      .getOrElse(return None)
    val (w1, w2, w3) = dict.get("W") match {
      case Some(PArr(Vector(PNum(a), PNum(b), PNum(c))))
          if a >= 0 && a <= 8 && b >= 0 && b <= 8 && c >= 0 && c <= 8 =>
        (a.toInt, b.toInt, c.toInt)
      case _ => return None
    }
    val rowLen = w1 + w2 + w3
    if (rowLen == 0) return None
    val size = dict.get("Size") match {
      case Some(PNum(x)) if x >= 0 => x.toLong
      case _ => return None
    }
    val index: Seq[(Long, Long)] = dict.get("Index") match {
      case Some(PArr(items)) if items.size % 2 == 0 =>
        items.grouped(2).map {
          // per-pair cap BEFORE summing: unbounded counts could wrap
          // the Long total and bypass the row-bound check below
          case Vector(PNum(s), PNum(c))
              if s >= 0 && c >= 0 && c <= (1L << 22) =>
            (s.toLong, c.toLong)
          case _ => return None
        }.toSeq
      case None => Seq((0L, size))
      case _ => return None
    }
    val total = index.map(_._2).sum // ≤ 32768 pairs × 2^22: no overflow
    // rows must physically exist in the decoded payload; absolute cap
    // mirrors the other parsers' hostile-count ceiling
    if (total * rowLen > payload.length || total > (1L << 22)) return None
    var entries = List.empty[(Int, XEntry)]
    var pos = 0
    def field(wid: Int): Long = {
      var v = 0L
      var k = 0
      while (k < wid) { v = (v << 8) | (payload(pos) & 0xffL); pos += 1; k += 1 }
      v
    }
    for ((start, count) <- index; i <- 0L until count) {
      val t = if (w1 == 0) 1L else field(w1)
      val f2 = field(w2)
      val f3 = field(w3)
      val num = (start + i).toInt
      t match {
        case 0 => entries ::= ((num, XFree))
        case 1 =>
          if (f2 < 0 || f2 >= bytes.length) return None
          entries ::= ((num, XUsed(f2.toInt)))
        case 2 =>
          if (f2 < 0 || f2 > Int.MaxValue || f3 < 0 || f3 > Int.MaxValue)
            return None
          entries ::= ((num, XInStream(f2.toInt, f3.toInt)))
        case _ => () // unknown types: "shall be ignored" per spec
      }
    }
    Some((entries.reverse, dict))
  }

  /** Maximum incremental-update generations followed before failing
    * closed (real documents carry a handful; hundreds is hostile).
    */
  private final val MaxPrevChain = 64

  /** Parse header, startxref, and the cross-reference sections —
    * classic `xref` keyword tables or /Type /XRef STREAMS, dispatched
    * per section — INCLUDING incremental-update chains: trailer /Prev
    * links walk newest → oldest, newer sections shadow older ones
    * (including deletions via free entries), and /Root · /Info come
    * from the NEWEST trailer. Fail closed (None) on: encryption,
    * hybrid-reference files (XRefStm), /Prev cycles or chains past
    * [[MaxPrevChain]], malformed anything.
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
    val compressed = mutable.Map.empty[Int, (Int, Int)]
    var inUse = List.empty[(Int, Int)]
    var newestTrailer: Map[String, Obj] = null
    val visited = mutable.Set.empty[Long]
    var cur = xrefOff
    while (cur >= 0) {
      if (visited.contains(cur) || visited.size >= MaxPrevChain ||
          cur >= bytes.length) return None // cycle / hostile chain
      visited += cur
      // classic "xref" keyword table, else a /Type /XRef stream
      val probe = new Lexer(bytes, cur.toInt)
      val (entries, trailer) = (if (probe.word() == "xref")
        parseXrefSection(bytes, cur.toInt)
      else parseXrefStreamAt(bytes, cur.toInt)).getOrElse(return None)
      if (trailer.contains("XRefStm") || trailer.contains("Encrypt"))
        return None // hybrid-reference files + encryption: fail closed
      for ((num, e) <- entries if !claimed.contains(num)) {
        claimed += num
        e match {
          case XUsed(off) => offsets += (num -> off); inUse ::= ((num, off))
          case XInStream(stm, idx) => compressed += (num -> ((stm, idx)))
          case XFree => ()
        }
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
    Some(Doc(bytes, version, newestTrailer, offsets.toMap,
      compressed.toMap, xrefOk))
  }

  /** Header version without a full parse — the only field an
    * encrypted document still surrenders.
    */
  private def headerVersion(bytes: Array[Byte]): String = {
    if (!isPdf(bytes)) return ""
    var v = 5
    while (v < bytes.length && !isWs(bytes(v) & 0xff)) v += 1
    new String(bytes, 5, v - 5, "US-ASCII")
  }

  /** Does any trailer in the update chain carry /Encrypt? [[parse]]
    * fails closed on encryption (object streams, strings, and content
    * are ciphertext without the key material), but a corpus triage
    * must still WITNESS the document as encrypted rather than lump it
    * with garbage — this walk reads only the xref/trailer skeleton
    * (which the spec leaves unencrypted) under the same cycle caps.
    */
  def isEncrypted(bytes: Array[Byte]): Boolean = {
    if (!isPdf(bytes)) return false
    val tail = new String(bytes, math.max(0, bytes.length - 2048),
      math.min(2048, bytes.length), "ISO-8859-1")
    val sx = tail.lastIndexOf("startxref")
    if (sx < 0) return false
    val lex0 = new Lexer(bytes, math.max(0, bytes.length - 2048) + sx + 9)
    var cur = lex0.int().getOrElse(return false)
    val visited = mutable.Set.empty[Long]
    while (cur >= 0 && cur < bytes.length) {
      if (visited.contains(cur) || visited.size >= MaxPrevChain)
        return false
      visited += cur
      val probe = new Lexer(bytes, cur.toInt)
      val trailer = (if (probe.word() == "xref")
        parseXrefSection(bytes, cur.toInt)
      else parseXrefStreamAt(bytes, cur.toInt)) match {
        case Some((_, t)) => t
        case None => return false
      }
      if (trailer.contains("Encrypt")) return true
      cur = trailer.get("Prev") match {
        case Some(PNum(p)) if p >= 0 => p.toLong
        case _ => -1L
      }
    }
    false
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

  /** ASCIIHexDecode (ISO 32000-1 §7.4.2): hex pairs, whitespace
    * ignored, `>` is EOD (data past it ignored), an odd trailing digit
    * is padded with 0. Any other character is malformed → None.
    */
  private[graft] def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else if (c == '>') {
          if (hi >= 0) out.write(hi << 4) // odd final digit: pad 0
          return Some(out.toByteArray)
        } else if (isWs(c)) -1
        else return None
      if (d >= 0) {
        if (hi < 0) hi = d
        else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    // a missing EOD marker is tolerated (common in the wild): decode
    // what's there, same odd-digit padding rule
    if (hi >= 0) out.write(hi << 4)
    Some(out.toByteArray)
  }

  /** ASCII85Decode (ISO 32000-1 §7.4.3): 5 chars `!`..`u` → 4 bytes
    * big-endian base 85; `z` = a zero group (only at a group start);
    * whitespace ignored; `~>` is EOD; a final partial group of n chars
    * (2–4) pads with `u` and keeps n−1 bytes. Overflow, a 1-char
    * final group, `z` mid-group, or any other character → None.
    */
  private[graft] def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val group = new Array[Int](5)
    var k = 0
    def flush(n: Int): Boolean = { // n chars of the group are real
      var v = 0L
      var i = 0
      while (i < 5) { v = v * 85 + (if (i < n) group(i) else 84); i += 1 }
      if (v > 0xffffffffL) return false
      var b = 3
      while (b >= 4 - (n - 1)) { out.write(((v >> (8 * b)) & 0xff).toInt); b -= 1 }
      true
    }
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      if (c == '~') {
        if (i + 1 >= data.length || (data(i + 1) & 0xff) != '>') return None
        if (k == 1) return None // a lone trailing char is malformed
        if (k >= 2 && !flush(k)) return None
        return Some(out.toByteArray)
      } else if (c == 'z') {
        if (k != 0) return None
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (c >= '!' && c <= 'u') {
        group(k) = c - '!'
        k += 1
        if (k == 5) { if (!flush(5)) return None; k = 0 }
      } else if (!isWs(c)) return None
      i += 1
    }
    // missing EOD tolerated like ASCIIHex: decode the partial tail
    if (k == 1) return None
    if (k >= 2 && !flush(k)) return None
    Some(out.toByteArray)
  }

  /** ASCII85 encoder twin: 4-byte groups → 5 chars, `z` for interior
    * zero groups, padded final group keeps n+1 chars, `~>` EOD.
    */
  private[graft] def a85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(data.length * 5 / 4 + 8)
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      var b = 0
      while (b < 4) {
        v = (v << 8) | (if (b < n) data(i + b) & 0xffL else 0L)
        b += 1
      }
      if (v == 0 && n == 4) sb.append('z')
      else {
        val cs = new Array[Char](5)
        var j = 4
        var x = v
        while (j >= 0) { cs(j) = ('!' + (x % 85).toInt).toChar; x /= 85; j -= 1 }
        var c = 0
        while (c < n + 1) { sb.append(cs(c)); c += 1 }
      }
      if (sb.length % 64 < 5) sb.append('\n')
      i += n
    }
    sb.append("~>")
    sb.toString.getBytes("US-ASCII")
  }

  /** RunLengthDecode (ISO 32000-1 §7.4.5): length byte L — 0..127
    * copies the next L+1 bytes literally, 129..255 repeats the next
    * byte 257−L times, 128 is EOD. Truncation mid-token is malformed
    * → None; a missing EOD is tolerated like the ASCII armors (decode
    * what's there).
    */
  private[graft] def runLengthDecode(data: Array[Byte])
      : Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2 + 16)
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xff
      if (l == 128) return Some(out.toByteArray) // EOD
      else if (l < 128) {
        if (i + 1 + l + 1 > data.length) return None
        out.write(data, i + 1, l + 1)
        i += l + 2
      } else {
        if (i + 1 >= data.length) return None
        val b = data(i + 1) & 0xff
        var k = 257 - l
        while (k > 0) { out.write(b); k -= 1 }
        i += 2
      }
      if (out.size() > MaxInflateBytes) return None // bomb bound
    }
    Some(out.toByteArray)
  }

  /** RunLength encoder twin: greedy — a run of ≥2 identical bytes at
    * the cursor becomes a repeat token (capped at 128 repetitions);
    * otherwise bytes pack into a literal token (capped at 128 bytes)
    * that ends at the next ≥3-run, where a repeat starts paying; EOD
    * last.
    */
  private[graft] def rleEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 16)
    var i = 0
    while (i < data.length) {
      // measure the run at i
      var run = 1
      while (i + run < data.length && data(i + run) == data(i) &&
          run < 128) run += 1
      if (run >= 2) {
        out.write(257 - run); out.write(data(i))
        i += run
      } else {
        // literal stretch: until the next ≥3-run or 128 bytes
        val start = i
        var j = i
        while (j < data.length && j - start < 128 &&
            !(j + 2 < data.length && data(j) == data(j + 1) &&
              data(j) == data(j + 2))) j += 1
        out.write(j - start - 1)
        out.write(data, start, j - start)
        i = j
      }
    }
    out.write(128) // EOD
    out.toByteArray
  }

  /** LZWDecode (ISO 32000-1 §7.4.4; TIFF-convention LZW): 9→12-bit
    * MSB-first codes, 256 = clear-table, 257 = EOD, the code width
    * grows when `next + EarlyChange` reaches a power of two
    * (EarlyChange = 1 unless /DecodeParms says 0). Output capped like
    * FlateDecode; any malformed code stream → None.
    */
  private[graft] def lzwDecode(data: Array[Byte], earlyChange: Int)
      : Option[Array[Byte]] = {
    val cap = math.min(MaxInflateBytes.toLong,
      data.length.toLong * 1032 + 64).toInt
    val out = new java.io.ByteArrayOutputStream(math.min(8192, cap))
    val dict = new Array[Array[Byte]](4096)
    var i = 0
    while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
    var next = 258
    var width = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    while (true) {
      while (bitCnt < width && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xff); bitCnt += 8; pos += 1
      }
      if (bitCnt < width) return None // truncated: no EOD seen
      val code = ((bitBuf >> (bitCnt - width)) & ((1 << width) - 1)).toInt
      bitCnt -= width
      if (code == 257) return Some(out.toByteArray)
      else if (code == 256) { next = 258; width = 9; prev = null }
      else if (prev == null) {
        if (code > 255) return None // first code after clear: literal only
        out.write(code)
        prev = dict(code)
      } else {
        val entry =
          if (code < next && code != 256 && code != 257) dict(code)
          else if (code == next) prev :+ prev(0) // the KwKwK case
          else return None
        if (next < 4096) { dict(next) = prev :+ entry(0); next += 1 }
        if (out.size() + entry.length > cap) return None
        out.write(entry, 0, entry.length)
        prev = entry
        if (next + earlyChange >= (1 << width) && width < 12) width += 1
      }
    }
    None // unreachable
  }

  /** Undo PNG row predictors (RFC 2083 filter types 0–4) at one byte
    * per pixel — the /Predictor ≥ 10 form xref streams use. None on a
    * ragged payload or an unknown filter type.
    */
  private def pngPredict(data: Array[Byte], columns: Int)
      : Option[Array[Byte]] = {
    if (columns <= 0 || columns > (1 << 20)) return None
    val rowLen = columns + 1
    if (data.length == 0 || data.length % rowLen != 0) return None
    val rows = data.length / rowLen
    val out = new Array[Byte](rows * columns)
    var prev = new Array[Byte](columns) // implicit zero row
    var r = 0
    while (r < rows) {
      val ft = data(r * rowLen) & 0xff
      val src = r * rowLen + 1
      val dst = r * columns
      var c = 0
      while (c < columns) {
        val raw = data(src + c) & 0xff
        val left = if (c > 0) out(dst + c - 1) & 0xff else 0
        val up = prev(c) & 0xff
        val ul = if (c > 0) prev(c - 1) & 0xff else 0
        val v = ft match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 =>
            val p = left + up - ul
            val pa = (p - left).abs; val pb = (p - up).abs
            val pc = (p - ul).abs
            raw + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(dst + c) = (v & 0xff).toByte
        c += 1
      }
      prev = java.util.Arrays.copyOfRange(out, dst, dst + columns)
      r += 1
    }
    Some(out)
  }

  /** Stream payload after filters: none, one, or a CHAIN of
    * FlateDecode / LZWDecode / ASCIIHexDecode (applied in /Filter
    * order — the decode order, per spec), each with its aligned
    * /DecodeParms entry (1 = none, ≥ 10 = PNG row filters at Colors 1
    * / 8 bits; /EarlyChange 0|1 for LZW). Anything else — an image
    * filter, an unresolvable parms object that could be hiding a
    * predictor — fails closed (the header contract: refuse rather
    * than misread). `look` resolves indirect filter params — identity
    * for self-describing streams like the xref stream, which must
    * parse before any object can resolve.
    */
  private def decodeStream(dict: Map[String, Obj], data: Array[Byte],
      look: Obj => Option[Obj]): Option[Array[Byte]] = {
    val filters: Vector[String] =
      dict.get("Filter").map(f => look(f).getOrElse(return None)) match {
        case None => Vector.empty
        case Some(PName(n)) => Vector(n)
        case Some(PArr(items)) => items.map {
          case PName(n) => n
          case other => look(other) match {
            case Some(PName(n)) => n
            case _ => return None
          }
        }
        case _ => return None
      }
    val parms: Vector[Option[Map[String, Obj]]] =
      dict.get("DecodeParms").map(p => look(p).getOrElse(return None)) match {
        case None => Vector.fill(filters.length)(None)
        case Some(PDict(pm)) if filters.length == 1 => Vector(Some(pm))
        case Some(PNull) => Vector.fill(filters.length)(None)
        case Some(PArr(items)) if items.length <= filters.length =>
          // a SHORTER array pads with no-parms (writers omit the tail);
          // a longer one is malformed and falls to the catch-all
          items.map {
            case PDict(pm) => Some(pm)
            case PNull => None
            case other => look(other) match {
              case Some(PDict(pm)) => Some(pm)
              case Some(PNull) => None
              case _ => return None
            }
          }.padTo(filters.length, None)
        case _ => return None // lone dict against a chain / longer array
      }
    def num(pm: Map[String, Obj], k: String, dflt: Int): Int =
      pm.get(k).flatMap(look).collect { case PNum(x) => x.toInt }
        .getOrElse(dflt)
    def predict(d: Array[Byte], pmOpt: Option[Map[String, Obj]])
        : Option[Array[Byte]] = pmOpt match {
      case None => Some(d)
      case Some(pm) =>
        val pred = num(pm, "Predictor", 1)
        if (pred == 1) Some(d)
        else if (pred >= 10 && num(pm, "Colors", 1) == 1 &&
            num(pm, "BitsPerComponent", 8) == 8)
          pngPredict(d, num(pm, "Columns", 1))
        else None
    }
    filters.zip(parms).foldLeft(Option(data)) { case (acc, (name, pm)) =>
      acc.flatMap { d =>
        name match {
          case "FlateDecode" | "Fl" =>
            inflateAll(d).flatMap(predict(_, pm))
          case "LZWDecode" | "LZW" =>
            lzwDecode(d, pm.map(num(_, "EarlyChange", 1)).getOrElse(1))
              .flatMap(predict(_, pm))
          // the ASCII armors define no DecodeParms of their own, but a
          // parms entry aligned with them could still carry a
          // predictor — route through the same predict() as the
          // compression arms so it applies or refuses, never silently
          // drops (the header contract)
          case "ASCIIHexDecode" | "AHx" =>
            asciiHexDecode(d).flatMap(predict(_, pm))
          case "ASCII85Decode" | "A85" =>
            ascii85Decode(d).flatMap(predict(_, pm))
          case "RunLengthDecode" | "RL" =>
            runLengthDecode(d).flatMap(predict(_, pm))
          case _ => None
        }
      }
    }
  }

  private def streamData(doc: Doc, s: PStream): Option[Array[Byte]] =
    decodeStream(s.dict.m, s.data, o => doc.deref(o))

  // ------------------------------------------------------------------
  // metadata
  // ------------------------------------------------------------------
  final case class PdfMeta(version: String, nPages: Long, title: String,
      author: String, producer: String, created: String,
      xrefOk: Boolean, encrypted: Boolean = false)

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

  /** @param pages  page → chunks; each chunk becomes one show op
    * @param seed   drives the chunk encoding rotation (literal / hex /
    *               TJ split) so every path is exercised
    * @param flate  FlateDecode the content streams (ignored when
    *               `contentFilter` is set)
    * @param modern emit the PDF 1.5+ layout: dictionary objects packed
    *               into a /Type /ObjStm object stream and a /Type
    *               /XRef cross-reference STREAM (W [1 4 2], PNG Up
    *               predictor) instead of the classic xref table
    * @param contentFilter content-stream encoding override: "none" |
    *               "flate" | "lzw" | "ahx" | "a85" | "rle" |
    *               "ahx+flate" | "a85+flate" (chains: Flate applied
    *               first, the ASCII armor on top — decoded
    *               armor-then-Flate per /Filter order)
    * @param encrypt put an /Encrypt key in the trailer: the document
    *               parses as ENCRYPTED (the reader fails closed before
    *               touching objects, so the referenced dict need not
    *               exist) — the q_pdf_meta `encrypted` witness
    */
  final case class BuildSpec(pages: Seq[Seq[String]], title: String,
      author: String, producer: String, created: String,
      seed: Long = 0L, flate: Boolean = true, modern: Boolean = false,
      contentFilter: String = "", encrypt: Boolean = false)

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

  /** LZW encoder twin of [[lzwDecode]] (EarlyChange = 1 convention):
    * leading clear code, (prefix, byte) dictionary, width grows when
    * `next + 1` reaches a power of two, table cleared before it
    * overflows, EOD last.
    */
  private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    var next = 258
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        bos.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    val map = new java.util.HashMap[Long, Integer]()
    emit(256)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val key = (prefix.toLong << 8) | b
        val hit = map.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          emit(prefix)
          map.put(key, Integer.valueOf(next))
          next += 1
          // the decoder's counter runs ONE entry behind the encoder's
          // at each code boundary (its first code adds no entry), so
          // the encoder bumps at next >= 2^w where the decoder bumps
          // at next + EarlyChange >= 2^w — verified against the ISO
          // 32000 §7.4.4 worked example in PdfSpec
          if (next >= (1 << width) && width < 12) width += 1
          if (next == 4095) { // table nearly full: clear (early-change
            emit(256) //       convention also reserves the last slot)
            map.clear()
            next = 258
            width = 9
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) {
      emit(prefix)
      // the decoder adds a dictionary entry for this final data code
      // and (EarlyChange = 1) grows the width when next + 1 crosses a
      // power of two BEFORE reading the next code — so EOD must be
      // written at the grown width or boundary-length inputs (e.g.
      // 254/766/1790 emitted codes) desynchronize at the last code
      if (next + 1 >= (1 << width) && width < 12) width += 1
    }
    emit(257)
    if (bitCnt > 0) // flush: pad the tail byte with zero bits
      bos.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    bos.toByteArray
  }

  /** ASCIIHexDecode encoder twin: hex pairs, 64-char lines, `>` EOD. */
  private[graft] def ahxEncode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder(data.length * 2 + data.length / 32 + 2)
    var i = 0
    while (i < data.length) {
      sb.append(f"${data(i) & 0xff}%02x")
      if (i % 32 == 31) sb.append('\n')
      i += 1
    }
    sb.append('>')
    sb.toString.getBytes("US-ASCII")
  }

  /** (encoded bytes, the /Filter clause) for a content stream. */
  private def encodeContent(raw: Array[Byte], spec: BuildSpec)
      : (Array[Byte], String) = {
    val mode =
      if (spec.contentFilter.nonEmpty) spec.contentFilter
      else if (spec.flate) "flate" else "none"
    mode match {
      case "none" => (raw, "")
      case "flate" => (deflate(raw), " /Filter /FlateDecode")
      case "lzw" => (lzwEncode(raw), " /Filter /LZWDecode")
      case "ahx" => (ahxEncode(raw), " /Filter /ASCIIHexDecode")
      case "a85" => (a85Encode(raw), " /Filter /ASCII85Decode")
      case "rle" => (rleEncode(raw), " /Filter /RunLengthDecode")
      case "ahx+flate" => (ahxEncode(deflate(raw)),
        " /Filter [/ASCIIHexDecode /FlateDecode]")
      case "a85+flate" => (a85Encode(deflate(raw)),
        " /Filter [/ASCII85Decode /FlateDecode]")
      case other =>
        throw new IllegalArgumentException(s"contentFilter: $other")
    }
  }

  // ---- shared dictionary/content builders (both writer layouts) ----
  private val catalogDict = "<< /Type /Catalog /Pages 2 0 R >>"
  private val fontDict =
    "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
  private def pagesDict(nPages: Int): String = {
    val kids = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"
  }
  private def pageDict(i: Int): String =
    s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * i} 0 R >>"
  private def infoDict(spec: BuildSpec): String =
    s"<< /Title (${escapeLiteral(spec.title)}) " +
      s"/Author (${escapeLiteral(spec.author)}) " +
      s"/Producer (${escapeLiteral(spec.producer)}) " +
      s"/CreationDate (${escapeLiteral(spec.created)}) >>"

  /** One page's content stream: chunk c shown as literal Tj / hex Tj /
    * two-part TJ array by (seed + c) % 3, lines separated by Td.
    */
  private def contentFor(chunks: Seq[String], seed: Long): Array[Byte] = {
    val content = new StringBuilder("BT\n/F1 12 Tf\n72 720 Td\n")
    for ((chunk, c) <- chunks.zipWithIndex) {
      if (c > 0) content.append("0 -14 Td\n")
      (seed + c) % 3 match {
        case 0 => content.append(s"(${escapeLiteral(chunk)}) Tj\n")
        case 1 => content.append(s"<${hexOf(chunk)}> Tj\n")
        case _ =>
          // split at a CODEPOINT boundary: a UTF-16 midpoint could cut
          // a surrogate pair and mangle both halves on UTF-8 encode
          val half = chunk.offsetByCodePoints(0,
            chunk.codePointCount(0, chunk.length) / 2)
          content.append(s"[(${escapeLiteral(chunk.take(half))}) -250 " +
            s"(${escapeLiteral(chunk.drop(half))})] TJ\n")
      }
    }
    content.append("ET")
    content.toString.getBytes("UTF-8")
  }

  /** Deterministic PDF muxer: classic 10-digit xref table (PDF 1.4),
    * or the modern object-stream + xref-stream layout when
    * `spec.modern` (PDF 1.5). Object numbering is identical in both:
    * 1 catalog, 2 pages, 3 font, per page i (0-based) page 4+2i /
    * contents 5+2i, info last; modern adds ObjStm and XRef objects.
    */
  def write(spec: BuildSpec): Array[Byte] =
    if (spec.modern) writeModern(spec) else writeClassic(spec)

  private def writeClassic(spec: BuildSpec): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    def wb(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    w("%PDF-1.4\n%âãÏÓ\n")
    val nPages = spec.pages.size
    val infoNum = 4 + 2 * nPages
    val offsets = new Array[Long](infoNum + 1)
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = bos.size().toLong
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    obj(1)(w(catalogDict))
    obj(2)(w(pagesDict(nPages)))
    obj(3)(w(fontDict))
    for ((chunks, i) <- spec.pages.zipWithIndex) {
      obj(4 + 2 * i)(w(pageDict(i)))
      val (data, filter) = encodeContent(contentFor(chunks, spec.seed), spec)
      obj(5 + 2 * i) {
        w(s"<< /Length ${data.length}$filter >>\nstream\n")
        wb(data)
        w("\nendstream")
      }
    }
    obj(infoNum)(w(infoDict(spec)))
    val xrefOff = bos.size().toLong
    w(s"xref\n0 ${infoNum + 1}\n")
    w("0000000000 65535 f \n")
    for (n <- 1 to infoNum) w(f"${offsets(n)}%010d 00000 n \n")
    val enc = if (spec.encrypt) s" /Encrypt ${infoNum + 1} 0 R" else ""
    w(s"trailer\n<< /Size ${infoNum + 1} /Root 1 0 R /Info $infoNum 0 R$enc >>\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    bos.toByteArray
  }

  /** PDF 1.5 layout: every DICTIONARY object (catalog, pages, font,
    * page dicts, info) lives inside one /Type /ObjStm; content streams
    * stay direct (streams cannot nest in object streams); the xref is
    * a /Type /XRef STREAM with W [1 4 2] rows under the PNG Up
    * predictor — the shape ~every post-2007 producer emits.
    */
  private def writeModern(spec: BuildSpec): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    def wb(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
    w("%PDF-1.5\n%âãÏÓ\n")
    val nPages = spec.pages.size
    val infoNum = 4 + 2 * nPages
    val stmNum = infoNum + 1
    val xrefNum = infoNum + 2
    val offsets = new Array[Long](xrefNum + 1)
    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num) = bos.size().toLong
      w(s"$num 0 obj\n"); body; w("\nendobj\n")
    }
    // content streams as direct objects
    for ((chunks, i) <- spec.pages.zipWithIndex) {
      val (data, filter) = encodeContent(contentFor(chunks, spec.seed), spec)
      obj(5 + 2 * i) {
        w(s"<< /Length ${data.length}$filter >>\nstream\n")
        wb(data)
        w("\nendstream")
      }
    }
    // every dict object packed into ONE object stream
    val dictObjs: Seq[(Int, String)] =
      Seq(1 -> catalogDict, 2 -> pagesDict(nPages), 3 -> fontDict) ++
        (0 until nPages).map(i => (4 + 2 * i) -> pageDict(i)) :+
        (infoNum -> infoDict(spec))
    val bodyBuf = new StringBuilder
    val memberOffs = dictObjs.map { case (_, body) =>
      val off = bodyBuf.length
      bodyBuf.append(body).append('\n')
      off
    }
    val header = dictObjs.zip(memberOffs)
      .map { case ((num, _), off) => s"$num $off" }.mkString(" ") + "\n"
    val payload = deflate((header + bodyBuf).getBytes("ISO-8859-1"))
    obj(stmNum) {
      w(s"<< /Type /ObjStm /N ${dictObjs.size} /First ${header.length} " +
        s"/Length ${payload.length} /Filter /FlateDecode >>\nstream\n")
      wb(payload)
      w("\nendstream")
    }
    // the xref STREAM (it indexes itself, so its offset is fixed first)
    val xrefOff = bos.size().toLong
    offsets(xrefNum) = xrefOff
    val cols = 7 // W [1 4 2]
    def row(t: Int, f2: Long, f3: Int): Array[Byte] = Array(
      t.toByte,
      ((f2 >> 24) & 0xff).toByte, ((f2 >> 16) & 0xff).toByte,
      ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
      ((f3 >> 8) & 0xff).toByte, (f3 & 0xff).toByte)
    val dictIndex = dictObjs.map(_._1).zipWithIndex.toMap
    val rows: Seq[Array[Byte]] = (0 to xrefNum).map { num =>
      if (num == 0) row(0, 0L, 0xffff)
      else dictIndex.get(num) match {
        case Some(idx) => row(2, stmNum.toLong, idx)
        case None => row(1, offsets(num), 0)
      }
    }
    val enc = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](cols)
    for (r <- rows) { // PNG Up predictor, filter type 2 per row
      enc.write(2)
      var c = 0
      while (c < cols) { enc.write((r(c) - prev(c)) & 0xff); c += 1 }
      prev = r
    }
    val zenc = deflate(enc.toByteArray)
    obj(xrefNum) {
      val enc = if (spec.encrypt) s"/Encrypt ${xrefNum + 1} 0 R " else ""
      w(s"<< /Type /XRef /Size ${xrefNum + 1} /W [1 4 2] " +
        s"/Index [0 ${xrefNum + 1}] /Root 1 0 R /Info $infoNum 0 R $enc" +
        s"/Filter /FlateDecode " +
        s"/DecodeParms << /Predictor 12 /Columns $cols >> " +
        s"/Length ${zenc.length} >>\nstream\n")
      wb(zenc)
      w("\nendstream")
    }
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
        meta(b) match {
          case Some(m) =>
            Some((id, m.version, m.nPages, m.title, m.author,
              m.producer, m.created, m.xrefOk, m.encrypted))
          case None if isEncrypted(b) =>
            // encrypted: everything past the header is ciphertext to
            // us, but the row must SAY so instead of vanishing into
            // the parse-failure bucket
            Some((id, headerVersion(b), 0L, "", "", "", "", false, true))
          case None => None
        }
      }).toDF("doc_id", "version", "n_pages", "title", "author",
        "producer", "created", "xref_ok", "encrypted")
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
    * chunks, 5 chunks per page, the MODERN layout (object stream +
    * xref stream, PDF 1.5) for ids ≡ 0 (mod 3), content-stream filter
    * rotated by id % 7 (ASCIIHex / Flate / LZW / none / the
    * ASCIIHex-over-Flate CHAIN / ASCII85 / RunLength — older corpora
    * are full of LZW, RLE, and ASCII-armored streams), Info fields in
    * closed form — q_pdf_meta/
    * q_pdf_text recompute everything, and the text round trip (source
    * column → content streams → extraction) is exact by the uniform
    * '\n'-every-48-chars rule (page joins land on chunk boundaries).
    * A third of the corpus only passes through the xref-stream/ObjStm
    * path; 5/7 only through a non-trivial content filter. Ids ≡ 7
    * (mod 17) carry an /Encrypt trailer key: q_pdf_meta must witness
    * them as `encrypted` rows, q_pdf_text must drop them (ciphertext).
    */
  def syntheticPdfMedia(docs: Dataset[(java.lang.Long, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (boxed, text) =>
      val id = boxed.longValue()
      // chunk by CODEPOINTS, not UTF-16 units: the DuckDB oracle's
      // length()/substring() count codepoints, and a unit-based split
      // could cut a surrogate pair
      val cps = text.codePoints().toArray
      val chunks =
        if (cps.isEmpty) Seq("")
        else cps.grouped(48).map(a => new String(a, 0, a.length)).toSeq
      val pages = chunks.grouped(5).toSeq
      val created = f"D:${2000 + id % 22}%04d${1 + id % 12}%02d" +
        f"${1 + id % 28}%02d${id % 24}%02d${id % 60}%02d${id % 60}%02d"
      val filter = (id % 7) match {
        case 0 => "ahx"
        case 1 => "flate"
        case 2 => "lzw"
        case 3 => "none"
        case 4 => "ahx+flate"
        case 5 => "a85"
        case _ => "rle"
      }
      val pdf = write(BuildSpec(pages, title = s"Doc $id",
        author = s"Author${id % 5}", producer = "graft-pdf 1.0",
        created = created, seed = id, modern = id % 3 == 0,
        contentFilter = filter, encrypt = id % 17 == 7))
      (id, pdf, "application/pdf")
    }).toDF("doc_id", "bytes", "mime")
  }
}
