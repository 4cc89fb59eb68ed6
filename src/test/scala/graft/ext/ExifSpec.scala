package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** JPEG/EXIF parsing: real-ImageIO-JPEG roundtrip with a spliced APP1,
  * both TIFF byte orders, no-EXIF JPEGs, decoder compatibility, and
  * hostile input rejection.
  */
class ExifSpec extends AnyFunSuite with SparkTestBase {

  private def realJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.ORANGE)
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("roundtrip: spliced APP1 reads back; SOF dims survive; the file " +
      "still decodes with ImageIO") {
    val host = realJpeg(96, 64)
    val tagged = Exif.insertApp1(host, orientation = 6,
      make = "CamCorp", model = "Model9000")
    val m = Exif.parse(tagged).getOrElse(fail("parse returned None"))
    assert(m.width == 96 && m.height == 64)
    assert(m.orientation == 6 && m.make == "CamCorp" &&
      m.model == "Model9000")
    // the spliced file is still a decoder-valid JPEG
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(tagged))
    assert(img != null && img.getWidth == 96 && img.getHeight == 64)
  }

  test("no EXIF: SOF dims parse, orientation 0, empty make/model") {
    val m = Exif.parse(realJpeg(48, 32)).getOrElse(fail("None"))
    assert(m.width == 48 && m.height == 32)
    assert(m.orientation == 0 && m.make.isEmpty && m.model.isEmpty)
  }

  test("big-endian TIFF (MM) parses too") {
    // hand-build an MM APP1: header + 1-entry IFD (orientation SHORT)
    val host = realJpeg(32, 32)
    def be16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val tiff = "MM".getBytes("US-ASCII") ++ be16(42) ++ be32(8L) ++
      be16(1) ++
      (be16(0x0112) ++ be16(3) ++ be32(1L) ++ be16(8) ++ be16(0)) ++
      be32(0L)
    val payload = "Exif".getBytes("US-ASCII") ++
      Array(0.toByte, 0.toByte) ++ tiff
    val seg = Array(0xff.toByte, 0xe1.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload
    val tagged = host.take(2) ++ seg ++ host.drop(2)
    val m = Exif.parse(tagged).getOrElse(fail("None for MM"))
    assert(m.orientation == 8)
  }

  test("hostile input fails closed") {
    assert(Exif.parse(Array.emptyByteArray).isEmpty)
    assert(Exif.parse("not a jpeg".getBytes("UTF-8")).isEmpty)
    val good = Exif.insertApp1(realJpeg(40, 40), 3, "AAAA", "BBBB")
    for (cut <- Seq(2, 5, 20, good.length / 2))
      Exif.parse(good.take(cut)) // no throw is the assertion
    val flipped = good.clone()
    for (i <- Seq(3, 8, 25, 40)) flipped(i) = 0x7f.toByte
    Exif.parse(flipped) // no throw
  }

  test("exifMeta stage drops non-JPEG rows") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      (1L, Exif.insertApp1(realJpeg(64, 48), 2, "MakeX", "ModelY"),
        "image/jpeg"),
      (2L, "plain".getBytes("UTF-8"), "text/plain")))
      .toDF("doc_id", "bytes", "mime")
    val rows = Multimodal.exifMeta(media).collect()
    assert(rows.map(_.doc_id).toSeq == Seq(1L))
    assert(rows(0).orientation == 2L && rows(0).make == "MakeX")
  }
  test("Exif + GPS sub-IFDs: DateTimeOriginal and signed DMS " +
      "coordinates roundtrip; the host still decodes") {
    val host = realJpeg(64, 48)
    val tagged = Exif.insertApp1(host, orientation = 3,
      make = "CamCorp", model = "Model9000",
      dateTimeOriginal = "2019:07:16 20:17:40",
      latArcsec = 28L * 3600 + 36 * 60 + 30,    // 28 deg 36' 30" N
      lonArcsec = -(80L * 3600 + 39 * 60 + 3),  // 80 deg 39' 3" W
      hasGps = true)
    val m = Exif.parse(tagged).getOrElse(fail("parse returned None"))
    assert(m.orientation == 3 && m.make == "CamCorp")
    assert(m.dateTimeOriginal == "2019:07:16 20:17:40")
    assert(m.hasGps)
    assert(m.latArcsec == 28L * 3600 + 36 * 60 + 30)
    assert(m.lonArcsec == -(80L * 3600 + 39 * 60 + 3))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(tagged))
    assert(img != null && img.getWidth == 64)
    // equator/prime-meridian zero is hasGps=true with 0 arcsec
    val zero = Exif.parse(Exif.insertApp1(host, 1, "CamCorp",
      "Model9000", latArcsec = 0L, lonArcsec = 0L, hasGps = true)).get
    assert(zero.hasGps && zero.latArcsec == 0L && zero.lonArcsec == 0L)
    // and the 3-entry layout (no sub-IFDs) still reports absence
    val bare = Exif.parse(Exif.insertApp1(host, 1, "CamCorp",
      "Model9000")).get
    assert(!bare.hasGps && bare.dateTimeOriginal.isEmpty &&
      bare.latArcsec == 0L && bare.lonArcsec == 0L)
  }
}
