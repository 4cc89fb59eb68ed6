package graft.ext

/** WebP metadata probe (RIFF container): dimensions from whichever
  * bitstream the file leads with — `VP8 ` lossy (keyframe start code
  * + 14-bit dims), `VP8L` lossless (packed 14-bit dims), or `VP8X`
  * extended (24-bit canvas, ANIM flag + ANMF frame chunks for
  * animation). The modern image long tail next to [[Png]]/JPEG in a
  * crawled corpus.
  *
  * Hostile/truncated input fails CLOSED (None), never throws; RIFF
  * chunk sizes are attacker-controlled and bounded against the
  * payload extent before every read.
  */
object WebP {

  /** kind = "vp8" | "vp8l" | "vp8x"; frames > 1 only for an animated
    * VP8X (the ANMF chunk count).
    */
  final case class WebPInfo(kind: String, width: Int, height: Int,
      frames: Int)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  def isWebP(b: Array[Byte]): Boolean =
    b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "WEBP"

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u24(b: Array[Byte], off: Int): Int =
    u16(b, off) | ((b(off + 2) & 0xff) << 16)
  private def u32(b: Array[Byte], off: Int): Long =
    (u16(b, off) & 0xffffL) | ((u16(b, off + 2) & 0xffffL) << 16)

  def parse(b: Array[Byte]): Option[WebPInfo] = {
    if (!isWebP(b)) return None
    val riffEnd = {
      val declared = 8L + u32(b, 4)
      if (declared > b.length) return None // truncated vs declaration
      declared.toInt
    }
    var p = 12
    var info: Option[WebPInfo] = None
    var anim = false
    var frames = 0
    var chunks = 0
    while (p + 8 <= riffEnd && chunks < (1 << 20)) {
      chunks += 1
      val cc = fourcc(b, p)
      val size = u32(b, p + 4)
      if (size > Int.MaxValue - 16 || p + 8 + size > riffEnd) return None
      val d = p + 8
      cc match {
        case "VP8 " if info.isEmpty =>
          // lossy: 3-byte frame tag, keyframe start code 9D 01 2A,
          // then 14-bit width/height (scaling bits masked off)
          if (size < 10) return None
          if ((b(d + 3) & 0xff) != 0x9d || (b(d + 4) & 0xff) != 0x01 ||
              (b(d + 5) & 0xff) != 0x2a) return None
          val w = u16(b, d + 6) & 0x3fff
          val h = u16(b, d + 8) & 0x3fff
          if (w == 0 || h == 0) return None
          info = Some(WebPInfo("vp8", w, h, 1))
        case "VP8L" if info.isEmpty =>
          // lossless: 1-byte signature 0x2F, then width-1 / height-1
          // as 14-bit fields packed little-endian
          if (size < 5 || (b(d) & 0xff) != 0x2f) return None
          val bits = u32(b, d + 1)
          val w = (bits & 0x3fff).toInt + 1
          val h = ((bits >> 14) & 0x3fff).toInt + 1
          info = Some(WebPInfo("vp8l", w, h, 1))
        case "VP8X" if info.isEmpty =>
          // extended: flag byte (bit 1 = ANIM), 24-bit canvas - 1
          if (size < 10) return None
          anim = (b(d) & 0x02) != 0
          val w = u24(b, d + 4) + 1
          val h = u24(b, d + 7) + 1
          info = Some(WebPInfo("vp8x", w, h, 1))
        case "ANMF" => frames += 1
        case _ => () // ICCP/EXIF/XMP/ALPH/...: skipped
      }
      p += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    info match {
      case Some(i) if anim =>
        if (frames == 0) None else Some(i.copy(frames = frames))
      case other => other
    }
  }

  /** Deterministic writer twin for the three layouts. `frames > 1`
    * emits VP8X + ANIM + that many ANMF chunks (each carrying a
    * minimal frame header — metadata-level animation, like the APNG
    * twin). Payload bytes are seeded junk: the PROBE reads headers,
    * and the fixture must not be decodable by luck.
    */
  def write(kind: String, width: Int, height: Int, seed: Long,
      frames: Int = 1): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    def w16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff)
    }
    def w24(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      w16(o, v & 0xffff); o.write((v >> 16) & 0xff)
    }
    def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
      w16(o, (v & 0xffff).toInt); w16(o, ((v >> 16) & 0xffff).toInt)
    }
    def chunk(cc: String, data: Array[Byte]): Unit = {
      body.write(cc.getBytes("US-ASCII"))
      w32(body, data.length.toLong)
      body.write(data)
      if (data.length % 2 == 1) body.write(0)
    }
    def junk(n: Int): Array[Byte] =
      Array.tabulate(n)(k => ((seed + k) % 251).toByte)
    kind match {
      case "vp8" =>
        val d = new java.io.ByteArrayOutputStream()
        d.write(junk(3), 0, 3) // frame tag
        d.write(0x9d); d.write(0x01); d.write(0x2a)
        w16(d, width); w16(d, height)
        d.write(junk(24), 0, 24)
        chunk("VP8 ", d.toByteArray)
      case "vp8l" =>
        val d = new java.io.ByteArrayOutputStream()
        d.write(0x2f)
        val bits = (width - 1).toLong | ((height - 1).toLong << 14)
        w32(d, bits)
        d.write(junk(16), 0, 16)
        chunk("VP8L", d.toByteArray)
      case "vp8x" =>
        val d = new java.io.ByteArrayOutputStream()
        d.write(if (frames > 1) 0x02 else 0x00) // ANIM flag
        d.write(0); d.write(0); d.write(0) // reserved
        w24(d, width - 1); w24(d, height - 1)
        chunk("VP8X", d.toByteArray)
        if (frames > 1) {
          val anim = new java.io.ByteArrayOutputStream()
          w32(anim, 0L); anim.write(0); anim.write(0) // bg + loop
          chunk("ANIM", anim.toByteArray)
          for (f <- 0 until frames) {
            val fr = new java.io.ByteArrayOutputStream()
            w24(fr, 0); w24(fr, 0) // frame x/y
            w24(fr, width - 1); w24(fr, height - 1)
            w24(fr, 4 + f); fr.write(0) // duration + flags
            fr.write(junk(10), 0, 10)
            chunk("ANMF", fr.toByteArray)
          }
        }
      case other =>
        throw new IllegalArgumentException(s"webp kind: $other")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val payload = body.toByteArray
    w32(out, 4L + payload.length)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }
}
