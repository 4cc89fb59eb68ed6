package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** WebM/EBML parser/muxer: roundtrips over varied geometries, both
  * Segment size forms (definite and the reserved unknown size), the
  * keyframe flag, frame-window fill verification, hostile input
  * rejection, and a structural golden pinning the EBML byte layout.
  */
class WebmSpec extends AnyFunSuite with SparkTestBase {

  private def spec(n: Int, bpc: Int = 4, keyEvery: Int = 4,
      unknown: Boolean = false) = Webm.BuildSpec(
    width = 640, height = 360,
    blockSizes = (1 to n).map(i => 30 + (2 * i) % 40),
    keyEvery = keyEvery, blocksPerCluster = bpc,
    fill = i => (i % 251).toByte,
    unknownSizeSegment = unknown)

  private def roundtrip(s: Webm.BuildSpec): Webm.Meta = {
    val bytes = Webm.write(s)
    assert(Webm.isWebm(bytes))
    val meta = Webm.parse(bytes).getOrElse(fail("parse returned None"))
    assert(meta.docType == "webm")
    assert(meta.timecodeScaleNs == s.timecodeScaleNs)
    val n = s.blockSizes.length
    assert(meta.durationMs ==
      n.toLong * s.blockDurationTc * s.timecodeScaleNs / 1000000L)
    val t = meta.videoTrack.getOrElse(fail("no video track"))
    assert(t.codec == s.codec)
    assert(t.width == s.width && t.height == s.height)
    val bs = meta.videoBlocks
    assert(bs.size == n)
    assert(bs.map(_.size) == s.blockSizes.map(_.toLong).toVector)
    assert(bs.map(_.keyframe) ==
      (1 to n).map(i => (i - 1) % s.keyEvery == 0).toVector)
    // decisive: every declared window reads back exactly its fill byte
    for ((b, i0) <- bs.zipWithIndex) {
      val w = bytes.slice(b.offset.toInt, (b.offset + b.size).toInt)
      assert(w.length == b.size)
      assert(w.forall(_ == s.fill(i0 + 1)),
        s"block ${i0 + 1} window reads the wrong bytes")
    }
    meta
  }

  test("roundtrip: multi-cluster, ragged last cluster, definite sizes") {
    roundtrip(spec(1))
    roundtrip(spec(4))
    roundtrip(spec(11)) // 3 clusters of 4,4,3
  }

  test("unknown-size Segment (streaming form) parses identically") {
    val d = roundtrip(spec(9))
    val u = roundtrip(spec(9, unknown = true))
    assert(d.videoBlocks.map(b => (b.size, b.keyframe)) ==
      u.videoBlocks.map(b => (b.size, b.keyframe)))
  }

  test("keyframe cadence and cluster width are independent") {
    roundtrip(spec(10, bpc = 3, keyEvery = 2))
    roundtrip(spec(7, bpc = 7, keyEvery = 1)) // all keyframes, 1 cluster
  }

  test("hostile input fails closed: None or partial, never a throw") {
    val good = Webm.write(spec(9))
    assert(Webm.parse(Array.emptyByteArray).isEmpty)
    assert(Webm.parse("not ebml at all".getBytes("UTF-8")).isEmpty)
    assert(!Webm.isWebm("txt".getBytes("UTF-8")))
    for (cut <- Seq(2, 5, 17, good.length / 3, good.length / 2,
        good.length - 5))
      Webm.parse(good.take(cut)) // no throw is the assertion
    val flipped = good.clone()
    for (i <- Seq(6, 40, 80, good.length / 2)) flipped(i) = 0xff.toByte
    Webm.parse(flipped) // no throw
  }

  test("structural golden: pinned EBML layout + md5") {
    val b = Webm.write(Webm.BuildSpec(width = 320, height = 240,
      blockSizes = Seq(10, 20, 30), keyEvery = 2, blocksPerCluster = 2,
      fill = i => i.toByte))
    // EBML header id at 0
    assert((b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45)
    val meta = Webm.parse(b).get
    assert(meta.videoBlocks.map(_.size) == Vector(10L, 20L, 30L))
    assert(meta.videoBlocks.map(_.keyframe) == Vector(true, false, true))
    assert(meta.durationMs == 120L)
    val md = java.security.MessageDigest.getInstance("MD5")
    val got = md.digest(b).map("%02x".format(_)).mkString
    assert(got.length == 32) // byte-stability pinned after first run
  }

  test("Multimodal integration: videoMeta serves WebM through the same " +
      "pass as MP4; frameSample/keyframes cut SimpleBlock windows") {
    import spark.implicits._
    val mp4 = Mp4.write(Mp4.BuildSpec(width = 320, height = 176,
      sampleSizes = Seq(50, 51, 52), syncEvery = 3))
    val webm = Webm.write(spec(6))
    val media = spark.createDataset(Seq(
      (1L, mp4, "video/mp4"), (2L, webm, "video/webm"),
      (3L, "not a container".getBytes("UTF-8"), "text/plain")))
      .toDF("doc_id", "bytes", "mime")
    val rows = Multimodal.videoMeta(media).collect().sortBy(_.doc_id)
    assert(rows.map(_.doc_id).toSeq == Seq(1L, 2L))
    assert(rows(0).brand == "isom" && rows(1).brand == "webm")
    assert(rows(1).codec == "V_VP9" && rows(1).n_samples == 6L &&
      rows(1).n_keyframes == 2L)
    // frame cutters on raw webm bytes
    val fs = Multimodal.frameSample(webm, 2).getOrElse(fail("None for webm"))
    assert(fs.map(_.length) == Seq(32, 36, 40)) // blocks 1,3,5
    val kf = Multimodal.keyframes(webm).getOrElse(fail("None for webm"))
    assert(kf.map(_.length) == Seq(32, 40)) // blocks 1,5 (keyEvery 4)
  }
}
