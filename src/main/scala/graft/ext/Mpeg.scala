package graft.ext

/** MPEG-1 video parsing (.mpg/.mpeg — the last entry of the
  * reference's video extension set, /root/reference/cc2dataset/
  * main.py:23-27) — pure bytes, no codec, completing the container
  * coverage alongside [[Mp4]]/[[Webm]]/[[Avi]].
  *
  * Two PUBLIC layouts (ISO/IEC 11172-1/-2):
  *
  *  - ELEMENTARY video stream: start-code walk (0x000001xx) over
  *    sequence header (B3: 12-bit width/height, frame-rate code), GOP
  *    headers (B8), picture headers (00: 10-bit temporal reference +
  *    3-bit picture_coding_type — I=1 pictures are the keyframes);
  *  - PROGRAM stream: pack headers (BA, MPEG-1 and MPEG-2 forms),
  *    system headers (BB), PES packets — video PES (E0-EF) payloads
  *    are unwrapped (MPEG-1 stuffing/STD/PTS-DTS header forms and the
  *    MPEG-2 flags+length form) and concatenated into the elementary
  *    stream, which then parses as above. Because one picture can
  *    span PES packet boundaries, frame payloads are cut from the
  *    REASSEMBLED elementary stream, not from raw file windows — the
  *    one container here whose frames are not contiguous file ranges.
  *
  * A picture's slice runs from its start code to the next start code
  * of any kind; with the muxer's layout that is exactly 8 header bytes
  * plus the payload, so fixtures stay closed-form. Hostile input fails
  * closed (start-code scans are extent-bounded; PES lengths are
  * validated against the remaining payload).
  */
object Mpeg {

  /** One picture: 1-based index, its slice (start code..next start
    * code) inside the ELEMENTARY stream, coding type, keyframe = I.
    */
  final case class Picture(index: Int, esOffset: Long, size: Long,
      codingType: Int) {
    def keyframe: Boolean = codingType == 1
  }

  final case class Meta(
      programStream: Boolean, width: Int, height: Int,
      frameRateCode: Int, pictures: Vector[Picture],
      es: Array[Byte]) {
    def keyframeCount: Int = pictures.count(_.keyframe)
    /** ms per frame by frame-rate code (11172-2 table: 1=23.976 …);
      * exact for the integer rates, rounded for the NTSC ones.
      */
    def msPerFrame: Long = frameRateCode match {
      case 1 => 42L // 23.976
      case 2 => 42L // 24 (41.67)
      case 3 => 40L // 25
      case 4 => 33L // 29.97
      case 5 => 33L // 30
      case 6 => 20L // 50
      case _ => 40L
    }
    def durationMs: Long = pictures.size.toLong * msPerFrame
    /** The picture's payload bytes (after the 8-byte start code +
      * picture header), from the reassembled elementary stream.
      */
    def payload(p: Picture): Array[Byte] =
      java.util.Arrays.copyOfRange(es, (p.esOffset + 8).toInt,
        (p.esOffset + p.size).toInt)
  }

  def isMpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 0 && bytes(1) == 0 &&
      bytes(2) == 1 &&
      ((bytes(3) & 0xff) == 0xba || (bytes(3) & 0xff) == 0xb3)

  /** Next 0x000001 start-code prefix position at or after `from`, or
    * -1. Leading zero-stuffing collapses onto the same code byte.
    */
  private def nextStartCode(b: Array[Byte], from: Int): Int = {
    var i = math.max(0, from)
    while (i + 3 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) return i
      i += 1
    }
    -1
  }

  /** Unwrap a program stream's video PES payloads into one elementary
    * stream. Unknown/other stream ids are skipped by their declared
    * length; a malformed length ends the walk (fail closed on the
    * tail).
    */
  private def demuxPs(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    var done = false
    while (!done) {
      val sc = nextStartCode(b, pos)
      if (sc < 0 || sc + 4 > b.length) done = true
      else {
        val code = b(sc + 3) & 0xff
        code match {
          case 0xba => // pack header: MPEG-2 form has '01' marker bits
            if (sc + 5 <= b.length && (b(sc + 4) & 0xc0) == 0x40) {
              // MPEG-2: 14 bytes + pack_stuffing_length (low 3 bits)
              if (sc + 14 > b.length) done = true
              else pos = sc + 14 + (b(sc + 13) & 0x7)
            } else pos = sc + 12 // MPEG-1: 12 bytes
          case c if c == 0xbb || (c >= 0xbc && c <= 0xff && !(c >= 0xe0 && c <= 0xef)) =>
            // system header / non-video PES / padding: length-prefixed
            if (sc + 6 > b.length) done = true
            else {
              val len = ((b(sc + 4) & 0xff) << 8) | (b(sc + 5) & 0xff)
              pos = sc + 6 + len
              if (pos > b.length) done = true
            }
          case c if c >= 0xe0 && c <= 0xef => // video PES
            if (sc + 6 > b.length) done = true
            else {
              val len = ((b(sc + 4) & 0xff) << 8) | (b(sc + 5) & 0xff)
              val end = sc + 6 + len
              if (len == 0 || end > b.length) done = true
              else {
                var p = sc + 6
                if ((b(p) & 0xc0) == 0x80) {
                  // MPEG-2 PES: flags byte + PES_header_data_length
                  if (p + 3 <= end) p = p + 3 + (b(p + 2) & 0xff)
                  else p = end
                } else {
                  // MPEG-1 PES: stuffing, optional STD, PTS/DTS forms
                  while (p < end && (b(p) & 0xff) == 0xff) p += 1
                  if (p < end && (b(p) & 0xc0) == 0x40) p += 2 // STD
                  if (p < end) {
                    val t = b(p) & 0xf0
                    if (t == 0x20) p += 5        // PTS only
                    else if (t == 0x30) p += 10  // PTS + DTS
                    else p += 1                  // '00001111' no stamps
                  }
                }
                if (p < end) out.write(b, p, end - p)
                pos = end
              }
            }
          case _ => pos = sc + 4 // elementary-level codes: not at PS level
        }
      }
    }
    out.toByteArray
  }

  /** Parse either layout. None unless a sequence header and at least
    * one picture parse.
    */
  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isMpeg(bytes)) return None
      val ps = (bytes(3) & 0xff) == 0xba
      val es = if (ps) demuxPs(bytes) else bytes
      if (es.length < 12) return None
      var width = 0
      var height = 0
      var frc = 0
      val pics = Vector.newBuilder[Picture]
      var picStart = -1L
      var picType = 0
      var idx = 0
      var pos = 0
      var done = false
      def closePicture(endAt: Long): Unit =
        if (picStart >= 0) {
          idx += 1
          pics += Picture(idx, picStart, endAt - picStart, picType)
          picStart = -1L
        }
      while (!done) {
        val sc = nextStartCode(es, pos)
        if (sc < 0) {
          closePicture(es.length.toLong)
          done = true
        } else {
          val code = es(sc + 3) & 0xff
          closePicture(sc.toLong)
          code match {
            case 0xb3 if sc + 8 <= es.length => // sequence header
              width = ((es(sc + 4) & 0xff) << 4) | ((es(sc + 5) & 0xff) >> 4)
              height = ((es(sc + 5) & 0xf) << 8) | (es(sc + 6) & 0xff)
              frc = es(sc + 7) & 0xf
            case 0x00 if sc + 6 <= es.length => // picture header
              picStart = sc.toLong
              picType = ((es(sc + 5) & 0xff) >> 3) & 0x7
            case _ => // GOP (B8), user data, slices, sequence end (B7)
          }
          pos = sc + 4
        }
      }
      val pictures = pics.result()
      if (width <= 0 || height <= 0 || pictures.isEmpty) None
      else Some(Meta(ps, width, height, frc, pictures, es))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // Minimal muxer (the inverse, for closed-form fixtures)
  // ------------------------------------------------------------------

  /** Spec of an MPEG-1 video: `payloadSizes(i)` fills 1-based picture
    * i with `fill(i)` (start code + 4-byte picture header + payload =
    * an 8+size slice); pictures 1, 1+g, ... are I-frames with a GOP
    * header before them. `programStream` wraps the elementary stream
    * in MPEG-1 pack + video PES packets of `pesChunk` bytes
    * (exercising picture-spans-PES reassembly).
    */
  final case class BuildSpec(
      width: Int, height: Int,
      payloadSizes: Seq[Int],
      gopEvery: Int,
      frameRateCode: Int = 3, // 25 fps → exact 40 ms
      fill: Int => Byte = i => (i % 251).toByte,
      programStream: Boolean = false,
      pesChunk: Int = 512)

  /** The elementary stream for `spec`. */
  def writeEs(spec: BuildSpec): Array[Byte] = {
    val n = spec.payloadSizes.length
    require(n > 0 && spec.gopEvery >= 1)
    require(spec.width < 4096 && spec.height < 4096)
    val out = new java.io.ByteArrayOutputStream()
    def code(c: Int): Unit = { out.write(0); out.write(0); out.write(1)
      out.write(c) }
    // sequence header: H(12) V(12), aspect(4)=1 frc(4), bitrate(18)
    // all-ones marker(1) vbv(10) flag(1) -> 0x3FFFF marker etc (8 bytes)
    code(0xb3)
    out.write((spec.width >> 4) & 0xff)
    out.write(((spec.width & 0xf) << 4) | ((spec.height >> 8) & 0xf))
    out.write(spec.height & 0xff)
    out.write((1 << 4) | (spec.frameRateCode & 0xf))
    out.write(0xff); out.write(0xff); out.write(0xe0 | 0x1f); out.write(0x20)
    for (i <- 1 to n) {
      val isI = (i - 1) % spec.gopEvery == 0
      if (isI) { // GOP header: 25-bit timecode + flags (4 bytes)
        code(0xb8)
        out.write(0x00); out.write(0x08); out.write(0x00); out.write(0x40)
      }
      code(0x00) // picture start
      val t = if (isI) 1 else 2 // I else P
      val tempRef = (i - 1) & 0x3ff
      out.write((tempRef >> 2) & 0xff)
      out.write(((tempRef & 0x3) << 6) | (t << 3) | 0x7) // type + vbv hi
      out.write(0xff); out.write(0xf8) // vbv_delay tail + padding bits
      val payload = Array.fill(spec.payloadSizes(i - 1))(spec.fill(i))
      out.write(payload)
    }
    code(0xb7) // sequence end
    out.toByteArray
  }

  /** Serialize per `spec`: the elementary stream, or the MPEG-1
    * program-stream wrap of it.
    */
  def write(spec: BuildSpec): Array[Byte] = {
    val es = writeEs(spec)
    if (!spec.programStream) return es
    val out = new java.io.ByteArrayOutputStream()
    // MPEG-1 pack header: 0x000001BA + '0010' SCR (5 bytes) + mux rate
    out.write(Array[Byte](0, 0, 1, 0xba.toByte,
      0x21, 0x00, 0x01, 0x00, 0x01, 0x80.toByte, 0x00, 0x01))
    var off = 0
    while (off < es.length) {
      val take = math.min(spec.pesChunk, es.length - off)
      // video PES 0xE0, MPEG-1 header = single '00001111' byte
      val len = take + 1
      out.write(Array[Byte](0, 0, 1, 0xe0.toByte,
        ((len >> 8) & 0xff).toByte, (len & 0xff).toByte, 0x0f))
      out.write(es, off, take)
      off += take
    }
    out.toByteArray
  }
}
