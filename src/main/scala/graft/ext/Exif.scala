package graft.ext

/** JPEG/EXIF metadata parsing — pure bytes, no decode.
  *
  * Image pipelines need orientation (to know whether stored pixels are
  * rotated), camera make/model (dedup/provenance signals), and the
  * coded dimensions WITHOUT paying a full decode. Both layers are
  * PUBLIC formats: the JPEG segment grammar (ITU T.81 — FF-marker
  * segments with 2-byte lengths) and the EXIF APP1 payload (a TIFF 6.0
  * IFD: 12-byte entries of tag/type/count/value, both byte orders).
  * ImageIO decodes pixels but surfaces none of this; the reference has
  * no image metadata story at all (it ships links only).
  *
  * [[insertApp1]] is the fixture inverse: splice a minimal EXIF APP1
  * (Make, Model, Orientation) into a REAL ImageIO-encoded JPEG right
  * after SOI — decoders ignore it, this parser reads it back, and the
  * q_exif oracle recomputes the planted values closed-form.
  */
object Exif {

  /** width/height from the SOF segment (coded pixels, pre-rotation);
    * orientation 0 = absent (1 = upright, 3/6/8 = rotations).
    */
  final case class Meta(width: Int, height: Int, orientation: Int,
      make: String, model: String)

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Parse JPEG segments: SOF dims + the APP1 EXIF IFD when present.
    * None for non-JPEGs or a stream with no SOF before SOS/end.
    */
  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isJpeg(bytes)) return None
      var pos = 2
      var width = 0
      var height = 0
      var orientation = 0
      var make = ""
      var model = ""
      var done = false
      while (!done && pos + 4 <= bytes.length) {
        if ((bytes(pos) & 0xff) != 0xff) done = true
        else {
          val marker = bytes(pos + 1) & 0xff
          if (marker == 0xd8 || marker == 0x01 ||
            (marker >= 0xd0 && marker <= 0xd7)) pos += 2 // standalone
          else {
            val len = be16(bytes, pos + 2)
            if (len < 2 || pos + 2 + len > bytes.length) done = true
            else {
              if (marker == 0xe1 && len >= 8 + 6 &&
                new String(bytes, pos + 4, 4, "US-ASCII") == "Exif") {
                val t = pos + 10 // TIFF header start
                val (o, mk, md) = parseTiff(bytes, t, pos + 2 + len)
                orientation = o; make = mk; model = md
              } else if ((marker >= 0xc0 && marker <= 0xcf) &&
                marker != 0xc4 && marker != 0xc8 && marker != 0xcc &&
                len >= 7) {
                height = be16(bytes, pos + 5)
                width = be16(bytes, pos + 7)
              } else if (marker == 0xda) done = true // SOS: entropy data
              pos += 2 + len
            }
          }
        }
      }
      if (width <= 0 || height <= 0) None
      else Some(Meta(width, height, orientation, make, model))
    } catch { case _: Exception => None }

  /** TIFF IFD0 inside [t, end): (orientation, make, model) — missing
    * tags stay at their defaults. Both byte orders; counts/offsets are
    * bounded by the segment extent.
    */
  private def parseTiff(b: Array[Byte], t: Int, end: Int): (Int, String, String) = {
    if (t + 8 > end) return (0, "", "")
    val le = b(t) == 'I' && b(t + 1) == 'I'
    val be = b(t) == 'M' && b(t + 1) == 'M'
    if (!le && !be) return (0, "", "")
    def u16(i: Int): Int =
      if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    def u32(i: Int): Long =
      if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    if (u16(t + 2) != 42) return (0, "", "")
    val ifd = t + u32(t + 4).toInt
    if (ifd + 2 > end) return (0, "", "")
    val n = u16(ifd)
    var orientation = 0
    var make = ""
    var model = ""
    var k = 0
    while (k < n && ifd + 2 + 12 * (k + 1) <= end) {
      val e = ifd + 2 + 12 * k
      val tag = u16(e)
      val typ = u16(e + 2)
      val count = u32(e + 4)
      def ascii: String = {
        val start = if (count <= 4) e + 8 else t + u32(e + 8).toInt
        val lim = math.min(end.toLong, start + count).toInt
        if (start < t || start >= end) ""
        else {
          var z = start
          while (z < lim && b(z) != 0) z += 1
          new String(b, start, z - start, "US-ASCII")
        }
      }
      tag match {
        case 0x0112 if typ == 3 => orientation = u16(e + 8)
        case 0x010f if typ == 2 => make = ascii
        case 0x0110 if typ == 2 => model = ascii
        case _ =>
      }
      k += 1
    }
    (orientation, make, model)
  }

  /** Splice an EXIF APP1 (Make, Model, Orientation — little-endian
    * TIFF, IFD0 only) into a JPEG right after SOI. The host stays a
    * valid JPEG: decoders skip APP1 they don't consume.
    */
  def insertApp1(jpeg: Array[Byte], orientation: Int, make: String,
      model: String): Array[Byte] = {
    require(isJpeg(jpeg), "host must be a JPEG")
    require(orientation >= 1 && orientation <= 8)
    // values always go out-of-line: require >= 4 chars so the
    // NUL-terminated bytes never fit the 4-byte inline slot
    require(make.length >= 4 && model.length >= 4,
      "make/model must be at least 4 chars")
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val modelB = (model + "\u0000").getBytes("US-ASCII")
    // TIFF: header(8) IFD0 count(2) + 3 entries(36) + next(4) = 50,
    // then the out-of-line ASCII values
    val makeOff = 50L
    val modelOff = makeOff + makeB.length
    def entry(tag: Int, typ: Int, count: Long,
        value: Array[Byte]): Array[Byte] =
      le16(tag) ++ le16(typ) ++ le32(count) ++ value.padTo(4, 0.toByte)
    val ifd = le16(3) ++
      entry(0x010f, 2, makeB.length.toLong, le32(makeOff)) ++
      entry(0x0110, 2, modelB.length.toLong, le32(modelOff)) ++
      entry(0x0112, 3, 1L, le16(orientation) ++ le16(0)) ++
      le32(0L)
    val tiff = "II".getBytes("US-ASCII") ++ le16(42) ++ le32(8L) ++ ifd ++
      makeB ++ modelB
    val payload = "Exif".getBytes("US-ASCII") ++
      Array(0.toByte, 0.toByte) ++ tiff
    val seg = Array(0xff.toByte, 0xe1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }
}
