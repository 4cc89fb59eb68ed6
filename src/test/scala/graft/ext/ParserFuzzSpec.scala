package graft.ext

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** One hostile-input property over EVERY pure-byte parser: random
  * bytes, random truncations of VALID fixtures, and random single-byte
  * mutations of valid fixtures must never throw — the executor-safety
  * contract behind "one crafted file in a crawled corpus must not kill
  * a task". (Per-format semantics are pinned in the format specs; this
  * is the uniform crash-safety sweep.)
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val parsers: Seq[(String, Array[Byte] => Any)] = Seq(
    ("mp4", Mp4.parse _),
    ("webm", Webm.parse _),
    ("avi", Avi.parse _),
    ("mpeg", Mpeg.parse _),
    ("gif", Gif.parse _),
    ("tar", Tar.members _),
    ("zip", (b: Array[Byte]) =>
      Zip.members(b).map(m => Zip.extract(b, m))),
    ("pdf", (b: Array[Byte]) => (Pdf.meta(b), Pdf.extractText(b))),
    ("exif", Exif.parse _),
    ("png", Png.parse _),
    ("webp", WebP.parse _),
    ("avif", Avif.parse _),
    ("audio", Audio.parse _),
    ("subtitles", (b: Array[Byte]) =>
      Subtitles.parse(new String(b, java.nio.charset.StandardCharsets.UTF_8))),
    ("warc-html", (b: Array[Byte]) => graft.wat.WarcHtml.scanHtml(
      new String(b, java.nio.charset.StandardCharsets.UTF_8))),
    ("http-response", graft.wat.WarcHtml.htmlOfHttpResponse _))

  private val validFixtures: Seq[Array[Byte]] = Seq(
    Mp4.write(Mp4.BuildSpec(width = 64, height = 48,
      sampleSizes = Seq(50, 51, 52, 53), syncEvery = 2)),
    Mp4.writeFragmented(Mp4.FragBuildSpec(width = 64, height = 48,
      fragmentSizes = Seq(Seq(40, 41), Seq(42, 43, 44)), syncEvery = 3)),
    Webm.write(Webm.BuildSpec(width = 64, height = 48,
      blockSizes = Seq(30, 31, 32), keyEvery = 2)),
    Avi.write(Avi.BuildSpec(width = 64, height = 48,
      frameSizes = Seq(45, 46, 47), keyEvery = 2)),
    Mpeg.write(Mpeg.BuildSpec(width = 64, height = 48,
      payloadSizes = Seq(30, 31, 32), gopEvery = 2, programStream = true,
      pesChunk = 40)),
    Gif.write(Gif.BuildSpec(width = 64, height = 48,
      frameDataSizes = Seq(20, 21), delaysCs = Seq(5, 6), loop = 2)),
    Png.write(32, 24, seed = 9, frames = 3),
    WebP.write("vp8", 48, 32, seed = 4),
    WebP.write("vp8l", 48, 32, seed = 5),
    WebP.write("vp8x", 48, 32, seed = 6, frames = 2),
    // NOT in the sniffer-disjointness list below: avif legitimately
    // shares ftyp with mp4 — describeAny routes brand-first instead
    Avif.write("avif", 64, 48, items = 2, tiles = 4, seed = 7),
    Tar.write(Seq(("a.img", Array.fill(100)(1.toByte)),
      ("a.txt", "hi".getBytes("UTF-8")))),
    Zip.write(Seq(("a.txt", "hello zip".getBytes("UTF-8"), true),
      ("b.bin", Array.fill(80)(2.toByte), false))),
    Zip.write(Seq(("a.txt", "hello zip64".getBytes("UTF-8"), true),
      ("b.bin", Array.fill(80)(3.toByte), false)), zip64 = true),
    Pdf.write(Pdf.BuildSpec(Seq(Seq("page one text"), Seq("page two")),
      title = "t", author = "a", producer = "p",
      created = "D:20240101000000", seed = 1, flate = true)),
    Pdf.write(Pdf.BuildSpec(Seq(Seq("lzw page text")), title = "t",
      author = "a", producer = "p", created = "D:20240101000000",
      seed = 2, contentFilter = "lzw")),
    Pdf.write(Pdf.BuildSpec(Seq(Seq("hex armored page")), title = "t",
      author = "a", producer = "p", created = "D:20240101000000",
      seed = 0, contentFilter = "ahx+flate")),
    Pdf.write(Pdf.BuildSpec(Seq(Seq("modern page")), title = "t",
      author = "a", producer = "p", created = "D:20240101000000",
      seed = 2, flate = true, modern = true)),
    Audio.writeMp3(3, 9, 0, mono = false, id3Bytes = 20),
    Audio.writeFlac(44100, 2, 12345L),
    Audio.writeOgg(opus = true, 2, 48000L, 312, 5000L, 2),
    Audio.writeWav(8000, 1, 64),
    Subtitles.write(Seq(Subtitles.Cue(1, 0L, 900L, "x")), vtt = false)
      .getBytes("UTF-8"),
    graft.wat.WatFixture.pageHtml(1, Some("https://b.test/"),
      Seq(("IMG@/src", "a.jpg", "an alt", ""),
        ("A@/href", "d.pdf", "", "a doc"))).getBytes("UTF-8"))

  test("random bytes never throw in any parser") {
    val gen = Gen.choose(0, 4096).flatMap(n =>
      Gen.containerOfN[Array, Byte](n,
        Gen.choose(Byte.MinValue, Byte.MaxValue)))
    val params = Gen.Parameters.default
    for (trial <- 1 to 60) {
      val bytes = gen(params, org.scalacheck.rng.Seed(trial.toLong * 7919))
        .getOrElse(Array.emptyByteArray)
      for ((name, p) <- parsers)
        try p(bytes) // no throw is the property
        catch { case e: Throwable =>
          fail(s"parser $name threw on random input (trial $trial): $e")
        }
    }
  }

  test("truncations and single-byte mutations of valid files never throw") {
    val rnd = new scala.util.Random(4711)
    for (fx <- validFixtures; trial <- 1 to 40) {
      val mutated =
        if (trial % 2 == 0) fx.take(rnd.nextInt(fx.length + 1))
        else {
          val m = fx.clone()
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
          m
        }
      for ((name, p) <- parsers)
        try p(mutated)
        catch { case e: Throwable =>
          fail(s"parser $name threw on mutated fixture (trial $trial): $e")
        }
    }
  }

  test("cross-format dispatch: every valid fixture is claimed by at most " +
      "the right sniffers (magics are disjoint)") {
    val sniffers: Seq[(String, Array[Byte] => Boolean)] = Seq(
      ("mp4", Mp4.isMp4 _), ("webm", Webm.isWebm _), ("avi", Avi.isAvi _),
      ("mpeg", Mpeg.isMpeg _), ("gif", Gif.isGif _), ("tar", Tar.isTar _),
      ("zip", Zip.isZip _), ("pdf", Pdf.isPdf _), ("jpeg", Exif.isJpeg _),
      ("png", Png.isPng _), ("webp", WebP.isWebP _))
    for (fx <- validFixtures) {
      val claims = sniffers.count { case (_, s) => s(fx) }
      assert(claims <= 1, "two container sniffers claimed one payload")
    }
  }
}
