package graft.ext

/** Animated-GIF structure parsing — pure bytes, no LZW decode.
  *
  * GIF (GIF89a, the PUBLIC CompuServe/W3C spec) is the one ubiquitous
  * crawled ANIMATION format the video containers miss: frames are
  * image descriptors inside a single logical screen, with per-frame
  * delays in Graphic Control Extensions and looping in the NETSCAPE
  * application extension. ImageIO decodes only what it's asked for
  * and surfaces no timing; this walk recovers frame count, per-frame
  * delays, loop count, and each frame's exact LZW-data byte window —
  * everything a frame-sampling pipeline needs short of pixel decode.
  *
  * [[write]] is the fixture inverse, honest at the CONTAINER level
  * (the same bar as [[Mp4]]'s mp4v sample payloads): real header /
  * screen descriptor / GCE / image descriptors / sub-block framing,
  * deterministic fill standing in for the LZW stream.
  */
object Gif {

  /** One frame: 1-based index, the image's placement/size, the exact
    * byte window of its LZW data sub-blocks (concatenated payload
    * region including sub-block length prefixes — `dataOffset` is the
    * first sub-block's first DATA byte), and the preceding GCE delay
    * (centiseconds → ms).
    */
  final case class Frame(index: Int, left: Int, top: Int,
      width: Int, height: Int, dataOffset: Long, dataSize: Long,
      delayMs: Long)

  final case class Meta(
      version: String, width: Int, height: Int,
      loopCount: Int, // NETSCAPE ext: 0 = forever; -1 = absent
      frames: Vector[Frame]) {
    def durationMs: Long = frames.map(_.delayMs).sum
  }

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Parse the stream. None unless a well-formed header with at least
    * one complete image (fail closed on truncation mid-frame).
    */
  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isGif(bytes) || bytes.length < 13) return None
      val version = new String(bytes, 3, 3, "US-ASCII")
      val width = leU16(bytes, 6)
      val height = leU16(bytes, 8)
      val packed = bytes(10) & 0xff
      var pos = 13
      if ((packed & 0x80) != 0) // global color table
        pos += 3 * (1 << ((packed & 0x7) + 1))
      var pendingDelay = 0L
      var loopCount = -1
      val frames = Vector.newBuilder[Frame]
      var idx = 0
      var done = false
      // skip length-prefixed sub-blocks, returning the position after
      // the 0 terminator, or -1 when truncated
      def skipSubBlocks(from: Int): Int = {
        var p = from
        while (p < bytes.length && bytes(p) != 0) {
          p += 1 + (bytes(p) & 0xff)
        }
        if (p >= bytes.length) -1 else p + 1
      }
      while (!done && pos < bytes.length) {
        (bytes(pos) & 0xff) match {
          case 0x3b => done = true // trailer
          case 0x21 => // extension: label + sub-blocks
            if (pos + 2 >= bytes.length) done = true
            else {
              val label = bytes(pos + 1) & 0xff
              if (label == 0xf9 && pos + 7 < bytes.length &&
                (bytes(pos + 2) & 0xff) == 4) {
                pendingDelay = leU16(bytes, pos + 4) * 10L
              } else if (label == 0xff && pos + 14 <= bytes.length &&
                (bytes(pos + 2) & 0xff) == 11 &&
                new String(bytes, pos + 3, 8, "US-ASCII") == "NETSCAPE") {
                // sub-block: 3 bytes (1, loop lo, loop hi)
                if (pos + 17 <= bytes.length && (bytes(pos + 14) & 0xff) == 3)
                  loopCount = leU16(bytes, pos + 16)
              }
              val next = skipSubBlocks(pos + 2)
              if (next < 0) done = true else pos = next
            }
          case 0x2c => // image descriptor
            if (pos + 10 > bytes.length) done = true
            else {
              val left = leU16(bytes, pos + 1)
              val top = leU16(bytes, pos + 3)
              val w = leU16(bytes, pos + 5)
              val h = leU16(bytes, pos + 7)
              val ipacked = bytes(pos + 9) & 0xff
              var p = pos + 10
              if ((ipacked & 0x80) != 0) // local color table
                p += 3 * (1 << ((ipacked & 0x7) + 1))
              p += 1 // LZW minimum code size
              val dataStart = p + 1 // first sub-block's first data byte
              val next = skipSubBlocks(p)
              if (next < 0 || p >= bytes.length) done = true
              else {
                idx += 1
                frames += Frame(idx, left, top, w, h,
                  dataStart.toLong, (next - 1 - dataStart).toLong,
                  pendingDelay)
                pendingDelay = 0L
                pos = next
              }
            }
          case _ => done = true // unknown block: fail closed on the tail
        }
      }
      val fs = frames.result()
      if (width <= 0 || height <= 0 || fs.isEmpty) None
      else Some(Meta(version, width, height, loopCount, fs))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // Minimal muxer (container-honest, LZW payload is deterministic fill)
  // ------------------------------------------------------------------

  /** Spec: frame i (1-based) is one `frameDataSizes(i-1)`-byte data
    * sub-block filled with `fill(i)`, shown for `delaysCs(i-1)`
    * centiseconds. `loop` >= 0 writes the NETSCAPE extension.
    */
  final case class BuildSpec(
      width: Int, height: Int,
      frameDataSizes: Seq[Int],
      delaysCs: Seq[Int],
      loop: Int = -1,
      fill: Int => Byte = i => (i % 251).toByte)

  def write(spec: BuildSpec): Array[Byte] = {
    val n = spec.frameDataSizes.length
    require(n > 0 && spec.delaysCs.length == n)
    require(spec.frameDataSizes.forall(s => s > 0 && s < 255))
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(spec.width); le16(spec.height)
    out.write(0x80 | 0x00) // GCT present, 2 entries
    out.write(0); out.write(0)
    out.write(0); out.write(0); out.write(0) // GCT color 0: black
    out.write(0xff); out.write(0xff); out.write(0xff) // color 1: white
    if (spec.loop >= 0) {
      out.write(0x21); out.write(0xff); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); le16(spec.loop); out.write(0)
    }
    for (i <- 1 to n) {
      // graphic control extension: delay
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0x04) // disposal: restore to background
      le16(spec.delaysCs(i - 1))
      out.write(0); out.write(0)
      // image descriptor: full-screen frame, no local color table
      out.write(0x2c)
      le16(0); le16(0); le16(spec.width); le16(spec.height)
      out.write(0)
      out.write(2) // LZW minimum code size
      val sz = spec.frameDataSizes(i - 1)
      out.write(sz) // one data sub-block
      val data = Array.fill(sz)(spec.fill(i))
      out.write(data)
      out.write(0) // sub-block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }
}
