package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** PNG + WebP byte-level probes: roundtrips across layouts, CRC
  * verification, hostile input, the triage dispatch, the Spark stage.
  */
class ImageProbeSpec extends AnyFunSuite with SparkTestBase {

  test("png roundtrip: dims, depth/color, APNG frames, IDAT count") {
    val png = Png.write(48, 32, seed = 7)
    assert(Png.isPng(png))
    val m = Png.parse(png).get
    assert(m.width == 48 && m.height == 32)
    assert(m.bitDepth == 8 && m.colorType == 0)
    assert(m.frames == 1 && m.idat == 1)
    val apng = Png.parse(Png.write(16, 16, seed = 1, frames = 5)).get
    assert(apng.frames == 5)
    // the writer emits REAL zlib image data: the host decoder agrees
    val host = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(host.getWidth == 48 && host.getHeight == 32)
  }

  test("png: a flipped bit anywhere fails closed via chunk CRC") {
    val png = Png.write(24, 24, seed = 3)
    // corrupt one IHDR data byte (the width field)
    val bad = png.clone()
    bad(16) = (bad(16) + 1).toByte
    assert(Png.parse(bad).isEmpty)
    // corrupt an IDAT payload byte
    val bad2 = png.clone()
    bad2(60) = (bad2(60) ^ 0x40).toByte
    assert(Png.parse(bad2).isEmpty)
  }

  test("png hostile: truncations, lying lengths, giant dims never throw") {
    val png = Png.write(20, 10, seed = 2, frames = 3)
    for (cut <- 0 to png.length by 3) Png.parse(png.take(cut))
    assert(Png.parse(Array.empty[Byte]).isEmpty)
    assert(Png.parse("not a png at all".getBytes("UTF-8")).isEmpty)
    // a declared chunk length past the payload extent fails closed
    val lying = png.clone()
    lying(8) = 0x7f.toByte // IHDR length high byte
    assert(Png.parse(lying).isEmpty)
  }

  test("webp roundtrip: vp8 / vp8l / vp8x layouts, animation frames") {
    val vp8 = WebP.parse(WebP.write("vp8", 160, 90, seed = 1)).get
    assert(vp8 == WebP.WebPInfo("vp8", 160, 90, 1))
    val vp8l = WebP.parse(WebP.write("vp8l", 333, 77, seed = 2)).get
    assert(vp8l == WebP.WebPInfo("vp8l", 333, 77, 1))
    val anim = WebP.parse(WebP.write("vp8x", 64, 48, seed = 3,
      frames = 4)).get
    assert(anim == WebP.WebPInfo("vp8x", 64, 48, 4))
    val still = WebP.parse(WebP.write("vp8x", 64, 48, seed = 3)).get
    assert(still == WebP.WebPInfo("vp8x", 64, 48, 1))
  }

  test("webp hostile: truncations, bad start codes, odd sizes never throw") {
    val webp = WebP.write("vp8x", 32, 32, seed = 5, frames = 3)
    for (cut <- 0 to webp.length by 3) WebP.parse(webp.take(cut))
    assert(WebP.parse("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    // corrupt the VP8 keyframe start code
    val vp8 = WebP.write("vp8", 16, 16, seed = 1)
    val bad = vp8.clone()
    bad(23) = 0 // 0x9d of the start code
    assert(WebP.parse(bad).isEmpty)
    // RIFF size declaring more than the payload has
    val lying = vp8.clone()
    lying(4) = (lying(4) + 10).toByte
    assert(WebP.parse(lying).isEmpty)
  }

  test("avif roundtrip: brands, canvas ispe over tiles, iinf items") {
    val a = Avif.parse(Avif.write("avif", 320, 240, items = 1)).get
    assert(a == Avif.AvifInfo("avif", 320, 240, 1))
    // grid: 4 half-size tile ispe + the canvas ispe — largest wins
    val g = Avif.parse(Avif.write("heic", 128, 96, items = 5,
      tiles = 4)).get
    assert(g == Avif.AvifInfo("heic", 128, 96, 5))
    // Mp4 sniffs the same bytes (ftyp) but refuses them (no moov):
    // the brand-first dispatch is what routes them correctly
    val bytes = Avif.write("avif", 64, 64, items = 1)
    assert(Mp4.isMp4(bytes) && Mp4.parse(bytes).isEmpty)
    assert(Multimodal.describeAny(1L, bytes).format == "avif")
  }

  test("avif hostile: truncations, missing boxes, giant dims fail closed") {
    val avif = Avif.write("avif", 64, 48, items = 2, tiles = 4)
    for (cut <- 0 to avif.length by 3) Avif.parse(avif.take(cut))
    assert(Avif.parse(Array.empty[Byte]).isEmpty)
    // an mp4 movie is NOT claimed by the avif sniffer (brand gate)
    val mp4 = Mp4.write(Mp4.BuildSpec(64, 48, Seq(50, 51), syncEvery = 2))
    assert(!Avif.isAvif(mp4))
    // ispe declaring a hostile dimension fails closed
    val big = Avif.write("avif", (1 << 24) + 1, 10, items = 1)
    assert(Avif.parse(big).isEmpty)
    // no meta box at all
    val noMeta = avif.take(20) ++ Array.fill(20)(0.toByte)
    assert(Avif.parse(noMeta).isEmpty)
  }

  test("triage dispatches png and webp with dims + frames") {
    val r1 = Multimodal.describeAny(1L, Png.write(32, 16, 0, frames = 2))
    assert(r1.format == "png" && r1.width == 32 && r1.height == 16 &&
      r1.n_units == 2)
    val r2 = Multimodal.describeAny(2L, WebP.write("vp8l", 20, 30, 1))
    assert(r2.format == "webp" && r2.width == 20 && r2.height == 30 &&
      r2.n_units == 1)
  }

  test("imageProbe stage over the synthetic corpus") {
    import spark.implicits._
    val ids = spark.createDataset((0L to 23L).map(java.lang.Long.valueOf))
    val out = Multimodal.imageProbe(Multimodal.syntheticImageMedia(ids))
      .as[(Long, String, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 24)
    // id%4 picks the format; r = id/4 rotates the layout
    assert(out(0L) == ((0L, "png", "static", 16L, 16L, 1L))) // r=0
    assert(out(4L) == ((4L, "png", "apng", 80L, 16L, 2L))) // r=1
    assert(out(1L) == ((1L, "webp", "vp8", 32L, 32L, 1L))) // r=0
    assert(out(5L) == ((5L, "webp", "vp8l", 16L, 32L, 1L))) // r=1
    assert(out(9L)._3 == "vp8x" && out(9L)._6 == 2L) // r=2 → animated
    assert(out(2L) == ((2L, "avif", "avif", 48L, 48L, 1L))) // r=0
    assert(out(6L) == ((6L, "avif", "heic", 32L, 48L, 2L))) // r=1, grid
    assert(out(3L) == ((3L, "tiff", "none", 64L, 64L, 1L))) // r=0
    assert(out(7L) == ((7L, "tiff", "packbits", 48L, 64L, 2L))) // r=1
  }
}
