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
    * `dateTimeOriginal` is the Exif sub-IFD's capture stamp (tag
    * 0x9003, "YYYY:MM:DD HH:MM:SS"), "" when absent. `latArcsec` /
    * `lonArcsec` are the GPS sub-IFD coordinates as signed total
    * arc-seconds (S/W negative) — integer-exact for the
    * denominator-1 rationals cameras write, truncating otherwise;
    * `hasGps` distinguishes absent from a genuine 0°0'0".
    */
  final case class Meta(width: Int, height: Int, orientation: Int,
      make: String, model: String, dateTimeOriginal: String = "",
      latArcsec: Long = 0L, lonArcsec: Long = 0L, hasGps: Boolean = false)

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
      var tiff: TiffFields = TiffFields.Empty
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
                tiff = parseTiff(bytes, t, pos + 2 + len)
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
      else Some(Meta(width, height, tiff.orientation, tiff.make,
        tiff.model, tiff.dateTimeOriginal, tiff.latArcsec, tiff.lonArcsec,
        tiff.hasGps))
    } catch { case _: Exception => None }

  private final case class TiffFields(orientation: Int, make: String,
      model: String, dateTimeOriginal: String, latArcsec: Long,
      lonArcsec: Long, hasGps: Boolean)

  private object TiffFields {
    val Empty: TiffFields = TiffFields(0, "", "", "", 0L, 0L, hasGps = false)
  }

  /** TIFF IFD0 inside [t, end) plus the Exif (0x8769) and GPS (0x8825)
    * sub-IFDs it points to — missing tags stay at their defaults. Both
    * byte orders; counts/offsets are bounded by the segment extent, and
    * sub-IFD pointers are followed at most once each (no cycles).
    */
  private def parseTiff(b: Array[Byte], t: Int, end: Int): TiffFields = {
    if (t + 8 > end) return TiffFields.Empty
    val le = b(t) == 'I' && b(t + 1) == 'I'
    val be = b(t) == 'M' && b(t + 1) == 'M'
    if (!le && !be) return TiffFields.Empty
    // byte-order reads + IFD entry walk shared with the bare-TIFF
    // probe (graft.ext.TiffIfd) — EXIF is a TIFF file in a JPEG segment
    def u16(i: Int): Int = TiffIfd.u16(b, i, le)
    def u32(i: Int): Long = TiffIfd.u32(b, i, le)
    if (u16(t + 2) != 42) return TiffFields.Empty
    var orientation = 0
    var make = ""
    var model = ""
    var dateTime = ""
    var latRef = ""
    var lonRef = ""
    var lat = Long.MinValue
    var lon = Long.MinValue
    var exifIfd = -1L
    var gpsIfd = -1L
    def walkIfd(ifd: Int)(handle: (Int, Int, Long, Int) => Unit): Unit =
      if (ifd >= t) TiffIfd.walkIfd(b, t, end, le, ifd)(handle)
    def ascii(e: Int, count: Long): String = {
      val start = if (count <= 4) e + 8 else t + u32(e + 8).toInt
      val lim = math.min(end.toLong, start + count).toInt
      if (start < t || start >= end) ""
      else {
        var z = start
        while (z < lim && b(z) != 0) z += 1
        new String(b, start, z - start, "US-ASCII")
      }
    }
    /** 3 RATIONALs (deg, min, sec) at the entry's offset → total
      * arc-seconds, Long.MinValue when out of range or malformed.
      */
    def dmsArcsec(e: Int, count: Long): Long = {
      if (count != 3L) return Long.MinValue
      val start = t + u32(e + 8).toInt
      if (start < t || start + 24 > end) return Long.MinValue
      var total = 0L
      var i = 0
      val mult = Array(3600L, 60L, 1L)
      while (i < 3) {
        val num = u32(start + 8 * i)
        val den = u32(start + 8 * i + 4)
        if (den == 0L) return Long.MinValue
        total += num * mult(i) / den
        i += 1
      }
      total
    }
    walkIfd(t + u32(t + 4).toInt) { (tag, typ, count, e) =>
      tag match {
        case 0x0112 if typ == 3 => orientation = u16(e + 8)
        case 0x010f if typ == 2 => make = ascii(e, count)
        case 0x0110 if typ == 2 => model = ascii(e, count)
        case 0x8769 if typ == 4 => exifIfd = u32(e + 8)
        case 0x8825 if typ == 4 => gpsIfd = u32(e + 8)
        case _ =>
      }
    }
    if (exifIfd >= 0L) walkIfd(t + exifIfd.toInt) { (tag, typ, count, e) =>
      tag match {
        case 0x9003 if typ == 2 => dateTime = ascii(e, count)
        case _ =>
      }
    }
    if (gpsIfd >= 0L) walkIfd(t + gpsIfd.toInt) { (tag, typ, count, e) =>
      tag match {
        case 0x0001 if typ == 2 => latRef = ascii(e, count)
        case 0x0002 if typ == 5 => lat = dmsArcsec(e, count)
        case 0x0003 if typ == 2 => lonRef = ascii(e, count)
        case 0x0004 if typ == 5 => lon = dmsArcsec(e, count)
        case _ =>
      }
    }
    val hasGps = lat != Long.MinValue && lon != Long.MinValue &&
      latRef.nonEmpty && lonRef.nonEmpty
    TiffFields(orientation, make, model, dateTime,
      if (hasGps) (if (latRef == "S") -lat else lat) else 0L,
      if (hasGps) (if (lonRef == "W") -lon else lon) else 0L,
      hasGps)
  }

  /** Splice an EXIF APP1 (little-endian TIFF) into a JPEG right after
    * SOI. IFD0 carries Make, Model, Orientation; a non-empty
    * `dateTimeOriginal` adds the Exif sub-IFD (tag 0x9003), and
    * `hasGps` adds the GPS sub-IFD (lat/lon as signed total
    * arc-seconds split into deg/min/sec denominator-1 rationals with
    * N/S/E/W refs, the camera convention). The host stays a valid
    * JPEG: decoders skip APP1 they don't consume.
    */
  def insertApp1(jpeg: Array[Byte], orientation: Int, make: String,
      model: String, dateTimeOriginal: String = "",
      latArcsec: Long = 0L, lonArcsec: Long = 0L,
      hasGps: Boolean = false): Array[Byte] = {
    require(isJpeg(jpeg), "host must be a JPEG")
    require(orientation >= 1 && orientation <= 8)
    // values always go out-of-line: require >= 4 chars so the
    // NUL-terminated bytes never fit the 4-byte inline slot
    require(make.length >= 4 && model.length >= 4,
      "make/model must be at least 4 chars")
    require(dateTimeOriginal.isEmpty || dateTimeOriginal.length == 19,
      "DateTimeOriginal must be 'YYYY:MM:DD HH:MM:SS'")
    require(!hasGps || (math.abs(latArcsec) <= 90L * 3600 &&
      math.abs(lonArcsec) <= 180L * 3600), "GPS out of range")
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def entry(tag: Int, typ: Int, count: Long,
        value: Array[Byte]): Array[Byte] =
      le16(tag) ++ le16(typ) ++ le32(count) ++ value.padTo(4, 0.toByte)
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val modelB = (model + "\u0000").getBytes("US-ASCII")
    val dtB =
      if (dateTimeOriginal.isEmpty) Array.emptyByteArray
      else (dateTimeOriginal + "\u0000").getBytes("US-ASCII") // 20 bytes
    val hasDt = dtB.nonEmpty
    // IFD layout (offsets TIFF-relative): header(8), IFD0
    // (2 + 12*n0 + 4), optional Exif IFD (2 + 12 + 4 = 18), optional
    // GPS IFD (2 + 12*4 + 4 = 54), then the out-of-line values
    val n0 = 3 + (if (hasDt) 1 else 0) + (if (hasGps) 1 else 0)
    val ifd0End = 8L + 2 + 12L * n0 + 4
    val exifIfdOff = ifd0End
    val gpsIfdOff = if (hasDt) ifd0End + 18 else ifd0End
    val valuesStart = gpsIfdOff + (if (hasGps) 54 else 0)
    val makeOff = valuesStart
    val modelOff = makeOff + makeB.length
    val dtOff = modelOff + modelB.length
    val latOff = dtOff + dtB.length
    val lonOff = latOff + 24
    def dmsRationals(arcsec: Long): Array[Byte] = {
      val a = math.abs(arcsec)
      le32(a / 3600) ++ le32(1L) ++ le32(a % 3600 / 60) ++ le32(1L) ++
        le32(a % 60) ++ le32(1L)
    }
    def refBytes(c: Char): Array[Byte] =
      Array(c.toByte, 0.toByte) // NUL-terminated 2-byte ASCII, inline
    val ifd0 = le16(n0) ++
      entry(0x010f, 2, makeB.length.toLong, le32(makeOff)) ++
      entry(0x0110, 2, modelB.length.toLong, le32(modelOff)) ++
      entry(0x0112, 3, 1L, le16(orientation) ++ le16(0)) ++
      (if (hasDt) entry(0x8769, 4, 1L, le32(exifIfdOff))
       else Array.emptyByteArray) ++
      (if (hasGps) entry(0x8825, 4, 1L, le32(gpsIfdOff))
       else Array.emptyByteArray) ++
      le32(0L)
    val exifIfd =
      if (!hasDt) Array.emptyByteArray
      else le16(1) ++
        entry(0x9003, 2, dtB.length.toLong, le32(dtOff)) ++ le32(0L)
    val gpsIfd =
      if (!hasGps) Array.emptyByteArray
      else le16(4) ++
        entry(0x0001, 2, 2L, refBytes(if (latArcsec < 0) 'S' else 'N')) ++
        entry(0x0002, 5, 3L, le32(latOff)) ++
        entry(0x0003, 2, 2L, refBytes(if (lonArcsec < 0) 'W' else 'E')) ++
        entry(0x0004, 5, 3L, le32(lonOff)) ++
        le32(0L)
    val tiff = "II".getBytes("US-ASCII") ++ le16(42) ++ le32(8L) ++
      ifd0 ++ exifIfd ++ gpsIfd ++ makeB ++ modelB ++ dtB ++
      (if (hasGps) dmsRationals(latArcsec) ++ dmsRationals(lonArcsec)
       else Array.emptyByteArray)
    val payload = "Exif".getBytes("US-ASCII") ++
      Array(0.toByte, 0.toByte) ++ tiff
    val seg = Array(0xff.toByte, 0xe1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }
}
