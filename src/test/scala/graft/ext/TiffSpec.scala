package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Bare-TIFF probe: header dispatch both byte orders, IFD-chain page
  * count, compression names, PackBits rows, hostile chains, and
  * ImageIO decodability of the writer twin's output.
  */
class TiffSpec extends AnyFunSuite {

  test("writer twin emits a real TIFF ImageIO decodes") {
    for (packbits <- Seq(false, true)) {
      val t = Tiff.write(48, 32, pages = 1, packbits = packbits, seed = 9)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(t))
      assert(img != null, s"packbits=$packbits")
      assert(img.getWidth == 48 && img.getHeight == 32)
      // a pixel round-trips the seeded fill: raster(x, y) = (9 + x +
      // y*48) % 251 (gray, BlackIsZero)
      val got = img.getRaster.getSample(5, 3, 0)
      assert(got == ((9 + 3 * 48 + 5) % 251), s"packbits=$packbits")
    }
  }

  test("probe: dims, compression, multi-page chain") {
    val t1 = Tiff.write(64, 16, pages = 1, packbits = false, seed = 1)
    assert(Tiff.parse(t1).contains(
      Tiff.TiffMeta(64, 16, 1, 1, bigEndian = false)))
    val t3 = Tiff.write(32, 48, pages = 3, packbits = true, seed = 2)
    val m = Tiff.parse(t3).get
    assert(m.width == 32 && m.height == 48 && m.pages == 3 &&
      m.compression == 32773 && m.compressionName == "packbits")
    // big-endian header parses too (hand-built: MM, 42, IFD at 8,
    // 3 entries: dims + compression=5)
    val be = Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8,
      0, 3, // 3 entries
      0x01, 0x00, 0, 3, 0, 0, 0, 1, 0, 100, 0, 0, // width SHORT 100
      0x01, 0x01, 0, 3, 0, 0, 0, 1, 0, 50, 0, 0, // height SHORT 50
      0x01, 0x03, 0, 3, 0, 0, 0, 1, 0, 5, 0, 0, // lzw
      0, 0, 0, 0) // chain end
    assert(Tiff.parse(be).contains(
      Tiff.TiffMeta(100, 50, 5, 1, bigEndian = true)))
    assert(Tiff.parse(be).get.compressionName == "lzw")
  }

  test("hostile input: cycles, truncation, garbage fail closed") {
    // IFD chain cycling back to itself
    val t = Tiff.write(16, 16, pages = 2, seed = 3)
    // patch the LAST next-IFD pointer (the final 4 bytes written
    // before strip/ifd layout ends) to point at IFD0 — find IFD0 via
    // the header pointer and write it into the chain-end slot
    val ifd0 = (t(4) & 0xff) | ((t(5) & 0xff) << 8) |
      ((t(6) & 0xff) << 16) | ((t(7) & 0xff) << 24)
    val cyc = t.clone()
    // the file ends with the last IFD's next pointer (0): aim it back
    cyc(cyc.length - 4) = (ifd0 & 0xff).toByte
    cyc(cyc.length - 3) = ((ifd0 >> 8) & 0xff).toByte
    cyc(cyc.length - 2) = ((ifd0 >> 16) & 0xff).toByte
    cyc(cyc.length - 1) = ((ifd0 >> 24) & 0xff).toByte
    assert(Tiff.parse(cyc).isEmpty)
    // truncation inside the entry table
    assert(Tiff.parse(t.take(12)).isEmpty)
    assert(Tiff.parse(Array[Byte]('I', 'I', 42, 0)).isEmpty)
    assert(Tiff.parse("not a tiff at all".getBytes("UTF-8")).isEmpty)
    assert(!Tiff.isTiff("II*x".getBytes("UTF-8")))
    // fuzz: random bytes never throw
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 200)
      Tiff.parse(Array.fill(rnd.nextInt(128))(rnd.nextInt(256).toByte))
  }

  test("packBitsRow inverts through the PDF RunLength decoder") {
    // PackBits grammar == RunLengthDecode minus EOD: append 128 and
    // the pdf twin must reproduce the row — the shared-grammar witness
    val rnd = new scala.util.Random(11)
    for (row <- Seq(Array.empty[Byte], Array.fill(300)('a'.toByte),
        Array.tabulate(129)(_.toByte),
        Array.fill(500)(rnd.nextInt(2).toByte))) {
      val packed = Tiff.packBitsRow(row) :+ 128.toByte
      assert(Pdf.runLengthDecode(packed).exists(_.sameElements(row)),
        s"len=${row.length}")
    }
  }
}
