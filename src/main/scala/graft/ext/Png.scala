package graft.ext

import java.util.zip.{CRC32, Deflater}

/** PNG metadata probe — the most common image bytes in a crawled
  * multimodal corpus after JPEG: signature + chunk walk, IHDR
  * dimensions/depth/color-type, per-chunk CRC32 verification, APNG
  * frame count via the `acTL` chunk (an animated PNG is a sample
  * SEQUENCE to a frame-sampling stage, not one image).
  *
  * Same executor contract as every pure-byte parser here: hostile or
  * truncated input fails CLOSED (None), never throws, every declared
  * length is bounded by the payload extent before use (PNG chunk
  * lengths are attacker-controlled 32-bit values).
  */
object Png {

  /** width/height from IHDR; frames = acTL num_frames when the APNG
    * control chunk is present, else 1; idat = IDAT chunk count (a
    * structural sanity signal: zero means no image data at all).
    */
  final case class PngInfo(width: Int, height: Int, bitDepth: Int,
      colorType: Int, frames: Int, idat: Int)

  private val Sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => b(i) == Sig(i))

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Hard ceiling on declared dimensions: a 16M-pixel-side image is
    * hostile in this corpus, and w*h must not overflow downstream
    * Long math anywhere.
    */
  private final val MaxDim = 1 << 24

  def parse(b: Array[Byte]): Option[PngInfo] = {
    if (!isPng(b)) return None
    var p = 8
    var width = -1
    var height = -1
    var bitDepth = 0
    var colorType = 0
    var frames = 1
    var idat = 0
    var first = true
    var ended = false
    var chunks = 0
    while (!ended && p + 12 <= b.length && chunks < (1 << 20)) {
      chunks += 1
      val len = u32(b, p)
      if (len > Int.MaxValue - 12 || p + 12 + len > b.length) return None
      val ctype = new String(b, p + 4, 4, "US-ASCII")
      if (first && (ctype != "IHDR" || len != 13)) return None
      // every chunk's CRC covers type + data — verify as we walk, so
      // a bit-flipped header can never yield confident wrong dims
      val crc = new CRC32
      crc.update(b, p + 4, 4 + len.toInt)
      if (crc.getValue != u32(b, p + 8 + len.toInt)) return None
      ctype match {
        case "IHDR" =>
          if (!first) return None // IHDR only ever first
          width = u32(b, p + 8).toInt
          height = u32(b, p + 12).toInt
          bitDepth = b(p + 16) & 0xff
          colorType = b(p + 17) & 0xff
          if (width <= 0 || height <= 0 || width > MaxDim ||
              height > MaxDim) return None
        case "acTL" =>
          if (len < 8) return None
          val n = u32(b, p + 8)
          if (n <= 0 || n > (1 << 20)) return None
          frames = n.toInt
        case "IDAT" => idat += 1
        case "IEND" => ended = true
        case _ => () // ancillary chunks: skipped, CRC still verified
      }
      first = false
      p += 12 + len.toInt
    }
    if (width < 0 || !ended) return None // no IHDR / truncated stream
    Some(PngInfo(width, height, bitDepth, colorType, frames, idat))
  }

  /** Deterministic PNG writer twin: real zlib IDAT (8-bit grayscale,
    * filter-type-0 rows, byte (x + y + seed) % 251), optional APNG
    * acTL declaring `frames` (> 1 adds the control chunk the parser
    * reads — metadata-level APNG, fdAT frame payloads are out of
    * scope for a probe fixture).
    */
  def write(width: Int, height: Int, seed: Long,
      frames: Int = 1): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Sig)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      def w32(v: Long): Unit = {
        bos.write(((v >> 24) & 0xff).toInt); bos.write(((v >> 16) & 0xff).toInt)
        bos.write(((v >> 8) & 0xff).toInt); bos.write((v & 0xff).toInt)
      }
      w32(data.length.toLong)
      val tb = ctype.getBytes("US-ASCII")
      bos.write(tb)
      bos.write(data)
      val crc = new CRC32
      crc.update(tb)
      crc.update(data)
      w32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    def put32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >> 24) & 0xff).toByte; ihdr(off + 1) = ((v >> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >> 8) & 0xff).toByte; ihdr(off + 3) = (v & 0xff).toByte
    }
    put32(0, width); put32(4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // grayscale
    chunk("IHDR", ihdr)
    if (frames > 1) {
      val actl = new Array[Byte](8)
      actl(0) = ((frames >> 24) & 0xff).toByte; actl(1) = ((frames >> 16) & 0xff).toByte
      actl(2) = ((frames >> 8) & 0xff).toByte; actl(3) = (frames & 0xff).toByte
      chunk("acTL", actl) // num_plays 0 = loop forever
    }
    val raw = new Array[Byte](height * (width + 1))
    var y = 0
    while (y < height) {
      raw(y * (width + 1)) = 0 // filter type 0
      var x = 0
      while (x < width) {
        raw(y * (width + 1) + 1 + x) = ((x + y + seed) % 251).toByte
        x += 1
      }
      y += 1
    }
    val d = new Deflater()
    val idat = try {
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](math.max(64, raw.length + 64))
      val tmp = new java.io.ByteArrayOutputStream()
      while (!d.finished()) tmp.write(buf, 0, d.deflate(buf))
      tmp.toByteArray
    } finally d.end()
    chunk("IDAT", idat)
    chunk("IEND", Array.empty)
    bos.toByteArray
  }
}
