package graft.ext

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Animated-GIF walk + subtitle parsing: roundtrips, delay/loop
  * semantics, SRT/VTT dispatch, hostile input rejection.
  */
class GifSubtitleSpec extends AnyFunSuite with SparkTestBase {

  private def gifSpec(n: Int, loop: Int = -1) = Gif.BuildSpec(
    width = 120, height = 80,
    frameDataSizes = (1 to n).map(i => 20 + (4 * i) % 60),
    delaysCs = (1 to n).map(i => 4 + i % 6),
    loop = loop, fill = i => (i % 251).toByte)

  test("gif roundtrip: frames, delays, loop, exact data windows") {
    val s = gifSpec(5, loop = 3)
    val b = Gif.write(s)
    assert(Gif.isGif(b))
    val m = Gif.parse(b).getOrElse(fail("parse returned None"))
    assert(m.version == "89a" && m.width == 120 && m.height == 80)
    assert(m.loopCount == 3)
    assert(m.frames.size == 5)
    assert(m.frames.map(_.dataSize) ==
      s.frameDataSizes.map(_.toLong).toVector)
    assert(m.frames.map(_.delayMs) ==
      s.delaysCs.map(_ * 10L).toVector)
    assert(m.durationMs == s.delaysCs.map(_ * 10L).sum)
    for (f <- m.frames) {
      val w = b.slice(f.dataOffset.toInt, (f.dataOffset + f.dataSize).toInt)
      assert(w.forall(_ == s.fill(f.index)),
        s"frame ${f.index} window reads the wrong bytes")
    }
    // no NETSCAPE ext -> loopCount -1
    assert(Gif.parse(Gif.write(gifSpec(2))).get.loopCount == -1)
  }

  test("gif hostile input fails closed") {
    val good = Gif.write(gifSpec(4))
    assert(Gif.parse(Array.emptyByteArray).isEmpty)
    assert(Gif.parse("GIF99a junk".getBytes("UTF-8")).isEmpty)
    for (cut <- Seq(3, 8, 14, good.length / 2, good.length - 2))
      Gif.parse(good.take(cut)) // no throw is the assertion
    val flipped = good.clone()
    for (i <- Seq(6, 11, 20)) flipped(i) = 0x41.toByte
    Gif.parse(flipped) // no throw
  }

  test("a REAL ImageIO GIF parses: one frame, real LZW sub-blocks") {
    val img = new java.awt.image.BufferedImage(40, 30,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val m = Gif.parse(bos.toByteArray).getOrElse(fail("None for real GIF"))
    assert(m.width == 40 && m.height == 30 && m.frames.size == 1)
    assert(m.frames.head.dataSize > 0)
  }

  test("srt and vtt parse to identical cue timelines") {
    val cues = Seq(
      Subtitles.Cue(1, 500L, 2000L, "hello there"),
      Subtitles.Cue(2, 2500L, 4000L, "two lines\nof text"),
      Subtitles.Cue(3, 3661234L, 3662000L, "over an hour in"))
    val fromSrt = Subtitles.parse(Subtitles.write(cues, vtt = false))
    val fromVtt = Subtitles.parse(Subtitles.write(cues, vtt = true))
    assert(fromSrt == cues.toVector)
    assert(fromVtt == cues.toVector)
    // VTT short timestamps (MM:SS.mmm)
    val short = Subtitles.parse(
      "WEBVTT\n\n00:05.000 --> 00:07.500\nshort stamp\n")
    assert(short == Vector(Subtitles.Cue(1, 5000L, 7500L, "short stamp")))
    // cue identifiers before the time line are tolerated
    val withId = Subtitles.parse(
      "WEBVTT\n\nintro-cue\n00:00:01.000 --> 00:00:02.000\nwith id\n")
    assert(withId.head.text == "with id")
  }

  test("subtitle hostile/degenerate input: empty result, no throw") {
    assert(Subtitles.parse("").isEmpty)
    assert(Subtitles.parse("just some prose\n\nwith paragraphs").isEmpty)
    assert(Subtitles.parse("1\n00:00:02,000 --> 00:00:01,000\nbackwards\n")
      .isEmpty) // end < start is rejected
    assert(Subtitles.parse("1\n00:00:01,000 --> 00:00:02,000\n\n").isEmpty)
  }

  test("subtitleCues stage: doc-bounded explode, both formats one pass") {
    import spark.implicits._
    val ids = spark.createDataset(Seq(2L, 3L)).map(java.lang.Long.valueOf)
    val rows = Subtitles.subtitleCues(
      Subtitles.syntheticSubtitleDocs(ids), "doc_id", col("sub_text"))
      .collect().sortBy(r => (r.doc_id, r.cue_idx))
    assert(rows.count(_.doc_id == 2L) == 4) // 2 + 2%6
    assert(rows.count(_.doc_id == 3L) == 5)
    val first = rows.head
    assert(first.doc_id == 2L && first.start_ms == 2L &&
      first.end_ms == 1502L && first.text == "cue 1 of doc 2")
  }
}
