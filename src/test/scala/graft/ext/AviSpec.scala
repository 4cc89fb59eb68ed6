package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** AVI/RIFF parser/muxer: roundtrips (indexed + index-less), keyframe
  * flags, frame-window fill verification, hostile input rejection,
  * Multimodal integration alongside the other containers.
  */
class AviSpec extends AnyFunSuite with SparkTestBase {

  private def spec(n: Int, keyEvery: Int = 3, index: Boolean = true) =
    Avi.BuildSpec(width = 320, height = 240,
      frameSizes = (1 to n).map(i => 45 + (5 * i) % 60),
      keyEvery = keyEvery, fill = i => (i % 251).toByte,
      withIndex = index)

  private def roundtrip(s: Avi.BuildSpec): Avi.Meta = {
    val bytes = Avi.write(s)
    assert(Avi.isAvi(bytes))
    val m = Avi.parse(bytes).getOrElse(fail("parse returned None"))
    val n = s.frameSizes.length
    assert(m.codec == s.codec)
    assert(m.width == s.width && m.height == s.height)
    assert(m.totalFrames == n && m.frames.size == n)
    assert(m.durationMs == n.toLong * s.usPerFrame / 1000L)
    assert(m.frames.map(_.size) == s.frameSizes.map(_.toLong).toVector)
    val wantSync =
      if (s.withIndex) (1 to n).map(i => (i - 1) % s.keyEvery == 0)
      else (1 to n).map(_ => true)
    assert(m.frames.map(_.keyframe) == wantSync.toVector)
    for (f <- m.frames) {
      val w = bytes.slice(f.offset.toInt, (f.offset + f.size).toInt)
      assert(w.length == f.size)
      assert(w.forall(_ == s.fill(f.index)),
        s"frame ${f.index} window reads the wrong bytes")
    }
    m
  }

  test("roundtrip: indexed keyframes, varied frame counts incl. odd " +
      "sizes (RIFF 2-byte alignment)") {
    roundtrip(spec(1))
    roundtrip(spec(7))
    roundtrip(spec(10, keyEvery = 4))
  }

  test("no idx1 -> every frame is a keyframe") {
    val m = roundtrip(spec(6, index = false))
    assert(m.keyframeCount == 6)
  }

  test("hostile input fails closed: None or partial, never a throw") {
    val good = Avi.write(spec(8))
    assert(Avi.parse(Array.emptyByteArray).isEmpty)
    assert(Avi.parse("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(!Avi.isAvi("plain".getBytes("UTF-8")))
    for (cut <- Seq(3, 11, 30, good.length / 2, good.length - 5))
      Avi.parse(good.take(cut)) // no throw is the assertion
    val flipped = good.clone()
    for (i <- Seq(4, 20, good.length / 3)) flipped(i) = 0xee.toByte
    Avi.parse(flipped) // no throw
  }

  test("Multimodal integration: videoMeta serves AVI via the same pass; " +
      "frame cutters use chunk windows; WAV payloads are untouched") {
    import spark.implicits._
    val avi = Avi.write(spec(6))
    val wav = Audio.writeWav(8000, 1, 50)
    val media = spark.createDataset(Seq(
      (1L, avi, "video/x-msvideo"), (2L, wav, "audio/wav")))
      .toDF("doc_id", "bytes", "mime")
    val rows = Multimodal.videoMeta(media).collect()
    assert(rows.map(_.doc_id).toSeq == Seq(1L))
    assert(rows(0).brand == "avi" && rows(0).codec == "MJPG" &&
      rows(0).n_samples == 6L && rows(0).n_keyframes == 2L)
    val fs = Multimodal.frameSample(avi, 2).getOrElse(fail("None for avi"))
    assert(fs.map(_.length) == Seq(50, 60, 70)) // frames 1,3,5
    val kf = Multimodal.keyframes(avi).getOrElse(fail("None for avi"))
    assert(kf.map(_.length) == Seq(50, 65)) // frames 1,4
    assert(Multimodal.keyframes(wav).isEmpty)
  }
}
