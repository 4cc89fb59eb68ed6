package graft.ext

/** Low-level TIFF 6.0 IFD plumbing shared by the bare-TIFF probe
  * below and the EXIF APP1 walker ([[Exif]] — an EXIF block IS a TIFF
  * file embedded in a JPEG segment, same byte-order header, same
  * 12-byte entries). Bounds every read by the segment extent.
  */
private[ext] object TiffIfd {

  def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Walk one IFD's entries inside [t, end), dispatching
    * `handle(tag, type, count, entryOffset)`; entry count is bounded
    * by the extent. Returns the next-IFD pointer (0 = chain end, -1 =
    * malformed).
    */
  def walkIfd(b: Array[Byte], t: Int, end: Int, le: Boolean, ifd: Int)(
      handle: (Int, Int, Long, Int) => Unit): Long = {
    if (ifd < t || ifd + 2 > end) return -1L
    val n = u16(b, ifd, le)
    var k = 0
    while (k < n && ifd + 2 + 12 * (k + 1) <= end) {
      val e = ifd + 2 + 12 * k
      handle(u16(b, e, le), u16(b, e + 2, le), u32(b, e + 4, le), e)
      k += 1
    }
    val nextAt = ifd + 2 + 12 * n
    if (nextAt + 4 > end) -1L else u32(b, nextAt, le)
  }
}

/** Bare-TIFF probe: dims + compression from IFD0, page count from the
  * IFD chain — the 13th triage family. TIFF is what scanned-document
  * and fax corpora arrive as, usually multi-page, with PackBits or
  * LZW strips. Reuses the EXIF IFD grammar ([[TiffIfd]]); the probe
  * reads headers only (no strip decode).
  */
object Tiff {

  /** SHORT (3) and LONG (4) entry values both inline in the 4 value
    * bytes for count 1.
    */
  private def scalar(b: Array[Byte], e: Int, typ: Int, le: Boolean)
      : Long = typ match {
    case 3 => TiffIfd.u16(b, e + 8, le).toLong
    case 4 => TiffIfd.u32(b, e + 8, le)
    case _ => -1L
  }

  final case class TiffMeta(width: Int, height: Int, compression: Int,
      pages: Int, bigEndian: Boolean) {
    /** The TIFF 6.0 baseline names a probe consumer filters on. */
    def compressionName: String = compression match {
      case 1 => "none"
      case 2 => "ccitt-rle"
      case 3 => "g3"
      case 4 => "g4"
      case 5 => "lzw"
      case 6 | 7 => "jpeg"
      case 8 | 32946 => "deflate"
      case 32773 => "packbits"
      case _ => s"c$compression"
    }
  }

  def isTiff(b: Array[Byte]): Boolean =
    b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && (b(2) & 0xff) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && (b(3) & 0xff) == 42))

  /** Chain depth bound: real multi-page scans carry hundreds of
    * pages; tens of thousands of IFDs is a hostile loop.
    */
  private final val MaxPages = 65535

  def parse(b: Array[Byte]): Option[TiffMeta] = {
    if (!isTiff(b)) return None
    val le = b(0) == 'I'
    var width = -1L
    var height = -1L
    var compression = 1L
    var pages = 0
    val visited = scala.collection.mutable.Set.empty[Long]
    var ifd = TiffIfd.u32(b, 4, le)
    while (ifd > 0) {
      if (ifd > Int.MaxValue || visited.contains(ifd) ||
          visited.size >= MaxPages) return None // cycle / hostile chain
      visited += ifd
      val first = pages == 0
      val next = TiffIfd.walkIfd(b, 0, b.length, le, ifd.toInt) {
        (tag, typ, count, e) =>
          if (first && count == 1L) tag match {
            case 0x0100 => width = scalar(b, e, typ, le)
            case 0x0101 => height = scalar(b, e, typ, le)
            case 0x0103 => compression = scalar(b, e, typ, le)
            case _ =>
          }
      }
      if (next < 0) return None // truncated entry table
      pages += 1
      ifd = next
    }
    if (pages == 0 || width <= 0 || height <= 0 ||
        width > Int.MaxValue || height > Int.MaxValue ||
        compression < 0 || compression > Int.MaxValue) None
    else Some(TiffMeta(width.toInt, height.toInt, compression.toInt,
      pages, bigEndian = !le))
  }

  // ------------------------------------------------------------------
  // writer twin (fixtures)
  // ------------------------------------------------------------------

  /** PackBits one ROW (TIFF 6.0 packs rows independently): same token
    * grammar as PDF RunLengthDecode minus the EOD byte — literal
    * header n copies n+1 bytes, 257−n repeats the next byte, 128
    * unused.
    */
  private[ext] def packBitsRow(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(row.length + 8)
    var i = 0
    while (i < row.length) {
      var run = 1
      while (i + run < row.length && row(i + run) == row(i) && run < 128)
        run += 1
      if (run >= 2) {
        out.write(257 - run); out.write(row(i))
        i += run
      } else {
        val start = i
        var j = i
        while (j < row.length && j - start < 128 &&
            !(j + 2 < row.length && row(j) == row(j + 1) &&
              row(j) == row(j + 2))) j += 1
        out.write(j - start - 1)
        out.write(row, start, j - start)
        i = j
      }
    }
    out.toByteArray
  }

  /** A real little-endian grayscale TIFF: `pages` IFDs chained, one
    * strip per page, 8-bit BlackIsZero, deterministic seeded pixels,
    * `packbits = true` compresses each row per the spec. ImageIO's
    * TIFF plugin decodes the output (asserted in TiffSpec) — the
    * fixture is a real image, not a header shell.
    */
  def write(width: Int, height: Int, pages: Int = 1,
      packbits: Boolean = false, seed: Long = 0L): Array[Byte] = {
    require(width > 0 && height > 0 && pages > 0,
      s"dims: $width x $height x $pages")
    val bos = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    bos.write('I'); bos.write('I'); le16(42)
    val ifdPtrAt = bos.size()
    le32(0) // patched: offset of IFD0
    val ifdPtrPatches = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    var prevPtrAt = ifdPtrAt
    for (p <- 0 until pages) {
      // strip data first, then the page's IFD
      val raw = Array.tabulate(width * height)(i =>
        ((seed + p * 131L + i) % 251).toByte)
      val strip =
        if (!packbits) raw
        else {
          val sb = new java.io.ByteArrayOutputStream(raw.length + height)
          for (r <- 0 until height)
            sb.write(packBitsRow(
              java.util.Arrays.copyOfRange(raw, r * width, (r + 1) * width)))
          sb.toByteArray
        }
      val stripOff = bos.size()
      bos.write(strip, 0, strip.length)
      if (bos.size() % 2 == 1) bos.write(0) // IFDs sit on word boundaries
      val ifdOff = bos.size()
      ifdPtrPatches += ((prevPtrAt, ifdOff.toLong))
      def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
        le16(tag); le16(typ); le32(count)
        if (typ == 3) { le16(value.toInt); le16(0) } else le32(value)
      }
      le16(8) // entry count — ascending tag order per the spec
      entry(0x0100, 4, 1, width.toLong)
      entry(0x0101, 4, 1, height.toLong)
      entry(0x0102, 3, 1, 8) // BitsPerSample
      entry(0x0103, 3, 1, if (packbits) 32773 else 1)
      entry(0x0106, 3, 1, 1) // BlackIsZero
      entry(0x0111, 4, 1, stripOff.toLong) // StripOffsets
      entry(0x0116, 4, 1, height.toLong) // RowsPerStrip: one strip
      entry(0x0117, 4, 1, strip.length.toLong) // StripByteCounts
      prevPtrAt = bos.size()
      le32(0) // next-IFD pointer, patched by the following page
    }
    val out = bos.toByteArray
    for ((at, v) <- ifdPtrPatches) {
      out(at) = (v & 0xff).toByte
      out(at + 1) = ((v >> 8) & 0xff).toByte
      out(at + 2) = ((v >> 16) & 0xff).toByte
      out(at + 3) = ((v >> 24) & 0xff).toByte
    }
    out
  }
}
