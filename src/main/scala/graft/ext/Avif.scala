package graft.ext

/** AVIF / HEIC metadata probe — the ISO-BMFF *image* layout (`ftyp`
  * brand avif/heic + a `meta` box instead of `moov`): dimensions from
  * the `ispe` image-spatial-extents property under `meta → iprp →
  * ipco`, item count from `iinf`. The fastest-growing image bytes in
  * recent crawls; [[Mp4]] sniffs these files (they carry `ftyp`) but
  * correctly refuses them (no movie), so triage routes brand-first.
  *
  * Grid images carry one `ispe` per tile plus one for the
  * reconstructed canvas — the probe reports the LARGEST extents,
  * which is the canvas by construction.
  *
  * Hostile/truncated input fails CLOSED (None), never throws; box
  * sizes are attacker-controlled and bounded against the extent
  * before every descent.
  */
object Avif {

  /** brand = the ftyp major brand; items = iinf entry count (0 when
    * iinf is absent — dims alone still stand).
    */
  final case class AvifInfo(brand: String, width: Int, height: Int,
      items: Int)

  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")
  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private val Brands = Set("avif", "avis", "heic", "heix", "mif1", "msf1")

  def isAvif(b: Array[Byte]): Boolean =
    b.length >= 12 && tag(b, 4) == "ftyp" && Brands.contains(tag(b, 8))

  /** Walk child boxes of [from, to): (type, payload start, payload
    * end) — 32-bit sizes only (image metadata boxes are small; a
    * 64-bit `size==1` escape here is hostile and ends the walk).
    */
  private def boxes(b: Array[Byte], lo: Int, hi: Int)
      : Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
    private var p = lo
    def hasNext: Boolean = p + 8 <= hi
    def next(): (String, Int, Int) = {
      val size = u32(b, p)
      val t = tag(b, p + 4)
      if (size < 8 || p + size > hi) { p = hi; (t, hi, hi) }
      else {
        val r = (t, p + 8, (p + size).toInt)
        p += size.toInt
        r
      }
    }
  }

  private def findBox(b: Array[Byte], lo: Int, hi: Int, name: String)
      : Option[(Int, Int)] =
    boxes(b, lo, hi).collectFirst { case (`name`, s, e) if s < e => (s, e) }

  private final val MaxDim = 1 << 24

  def parse(b: Array[Byte]): Option[AvifInfo] = {
    if (!isAvif(b)) return None
    try {
      val brand = tag(b, 8)
      val (metaS, metaE) = boxes(b, 0, b.length)
        .collectFirst { case ("meta", s, e) if s < e => (s, e) }
        .getOrElse(return None)
      // meta is a FULLBOX: 4 bytes of version/flags before children
      val cs = metaS + 4
      if (cs >= metaE) return None
      val items = findBox(b, cs, metaE, "iinf").map { case (s, e) =>
        if (s >= e) return None
        val v = b(s) & 0xff // fullbox version: u16 count v0, u32 v1+
        if (v == 0) { if (s + 6 > e) return None else u16(b, s + 4) }
        else { if (s + 8 > e) return None else u32(b, s + 4).toInt }
      }.getOrElse(0)
      if (items < 0 || items > (1 << 20)) return None
      val (iprpS, iprpE) = findBox(b, cs, metaE, "iprp")
        .getOrElse(return None)
      val (ipcoS, ipcoE) = findBox(b, iprpS, iprpE, "ipco")
        .getOrElse(return None)
      // largest ispe extents = the reconstructed canvas on grids
      var bw = 0
      var bh = 0
      boxes(b, ipcoS, ipcoE).foreach {
        case ("ispe", s, e) if e - s >= 12 =>
          val w = u32(b, s + 4) // after the fullbox version/flags
          val h = u32(b, s + 8)
          if (w > 0 && h > 0 && w <= MaxDim && h <= MaxDim &&
              w.toLong * h.toLong > bw.toLong * bh.toLong) {
            bw = w.toInt
            bh = h.toInt
          }
        case _ => ()
      }
      if (bw == 0) None
      else Some(AvifInfo(brand, bw, bh, items))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** Deterministic writer twin: ftyp(brand) + meta{hdlr(pict),
    * iinf(entry_count, no entries — the COUNT is what the probe
    * reads), iprp{ipco{[tile ispe when `tiles`>0 ×tiles, then] canvas
    * ispe}}} + a junk mdat. Tile extents are half the canvas, so the
    * largest-extents rule provably picks the canvas.
    */
  def write(brand: String, width: Int, height: Int, items: Int,
      tiles: Int = 0, seed: Long = 0L): Array[Byte] = {
    def box(name: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(payload.length + 8)
      val size = payload.length + 8
      out.write((size >> 24) & 0xff); out.write((size >> 16) & 0xff)
      out.write((size >> 8) & 0xff); out.write(size & 0xff)
      out.write(name.getBytes("US-ASCII"))
      out.write(payload)
      out.toByteArray
    }
    def full(name: String, version: Int, payload: Array[Byte]): Array[Byte] =
      box(name, Array[Byte](version.toByte, 0, 0, 0) ++ payload)
    def be32(v: Int): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def ispe(w: Int, h: Int): Array[Byte] =
      full("ispe", 0, be32(w) ++ be32(h))
    val ftyp = box("ftyp",
      brand.getBytes("US-ASCII") ++ be32(0) ++
        brand.getBytes("US-ASCII") ++ "mif1".getBytes("US-ASCII"))
    val hdlr = full("hdlr", 0, be32(0) ++ "pict".getBytes("US-ASCII") ++
      new Array[Byte](13))
    val iinf = full("iinf", 0,
      Array[Byte](((items >> 8) & 0xff).toByte, (items & 0xff).toByte))
    val tileBoxes = (0 until tiles)
      .map(_ => ispe(width / 2, height / 2))
      .foldLeft(Array.empty[Byte])(_ ++ _)
    val ipco = box("ipco", tileBoxes ++ ispe(width, height))
    val iprp = box("iprp", ipco)
    val meta = full("meta", 0, hdlr ++ iinf ++ iprp)
    val mdat = box("mdat",
      Array.tabulate(32)(k => ((seed + k) % 251).toByte))
    ftyp ++ meta ++ mdat
  }
}
