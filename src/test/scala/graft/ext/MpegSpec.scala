package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** MPEG-1 parser/muxer: elementary-stream and program-stream
  * roundtrips (incl. pictures spanning PES packets), I/P keyframe
  * detection, zero/0x01 fill bytes (start-code-emulation hazards),
  * hostile input rejection, Multimodal integration.
  */
class MpegSpec extends AnyFunSuite with SparkTestBase {

  private def spec(n: Int, ps: Boolean = false, pesChunk: Int = 64,
      fill: Int => Byte = i => (i % 251).toByte) = Mpeg.BuildSpec(
    width = 352, height = 288,
    payloadSizes = (1 to n).map(i => 30 + (3 * i) % 45),
    gopEvery = 3, fill = fill,
    programStream = ps, pesChunk = pesChunk)

  private def roundtrip(s: Mpeg.BuildSpec): Mpeg.Meta = {
    val bytes = Mpeg.write(s)
    assert(Mpeg.isMpeg(bytes))
    val m = Mpeg.parse(bytes).getOrElse(fail("parse returned None"))
    assert(m.programStream == s.programStream)
    assert(m.width == s.width && m.height == s.height)
    assert(m.frameRateCode == s.frameRateCode)
    val n = s.payloadSizes.length
    assert(m.pictures.size == n)
    assert(m.durationMs == n.toLong * 40) // code 3 = 25 fps
    assert(m.pictures.map(_.size) ==
      s.payloadSizes.map(sz => 8L + sz).toVector)
    assert(m.pictures.map(_.keyframe) ==
      (1 to n).map(i => (i - 1) % s.gopEvery == 0).toVector)
    for (p <- m.pictures) {
      val payload = m.payload(p)
      assert(payload.length == p.size - 8)
      assert(payload.forall(_ == s.fill(p.index)),
        s"picture ${p.index} payload reads the wrong bytes")
    }
    m
  }

  test("elementary-stream roundtrip: dims, frame cadence, I/P types, " +
      "payload windows") {
    roundtrip(spec(1))
    roundtrip(spec(7))
    roundtrip(spec(10))
  }

  test("program-stream roundtrip: PES demux + reassembly, pictures " +
      "spanning packets") {
    val m = roundtrip(spec(8, ps = true, pesChunk = 48))
    assert(m.programStream)
    roundtrip(spec(5, ps = true, pesChunk = 2000)) // one big packet
  }

  test("start-code-emulation hazards: all-zero and all-0x01 payloads " +
      "still cut exact windows") {
    roundtrip(spec(6, fill = _ => 0x00.toByte))
    roundtrip(spec(6, fill = _ => 0x01.toByte))
    roundtrip(spec(6, ps = true, pesChunk = 37, fill = _ => 0x00.toByte))
  }

  test("hostile input fails closed: None or partial, never a throw") {
    val good = Mpeg.write(spec(8, ps = true))
    assert(Mpeg.parse(Array.emptyByteArray).isEmpty)
    assert(Mpeg.parse("no start codes here".getBytes("UTF-8")).isEmpty)
    assert(!Mpeg.isMpeg("xxxx".getBytes("UTF-8")))
    for (cut <- Seq(3, 9, 20, good.length / 2, good.length - 4))
      Mpeg.parse(good.take(cut)) // no throw is the assertion
    val flipped = good.clone()
    for (i <- Seq(3, 14, good.length / 3)) flipped(i) = 0x77.toByte
    Mpeg.parse(flipped) // no throw
  }

  test("Multimodal integration: videoMeta brands ps vs es; frame " +
      "cutters slice the reassembled elementary stream") {
    import spark.implicits._
    val es = Mpeg.write(spec(6))
    val ps = Mpeg.write(spec(6, ps = true, pesChunk = 50))
    val media = spark.createDataset(Seq(
      (1L, es, "video/mpeg"), (2L, ps, "video/mpeg")))
      .toDF("doc_id", "bytes", "mime")
    val rows = Multimodal.videoMeta(media).collect().sortBy(_.doc_id)
    assert(rows.map(_.brand).toSeq == Seq("mpeg-es", "mpeg-ps"))
    assert(rows.forall(r => r.codec == "mpeg1" && r.n_samples == 6L &&
      r.n_keyframes == 2L && r.duration_ms == 240L))
    assert(rows(0).total_sample_bytes == rows(1).total_sample_bytes)
    // sizes: payload 30 + (3i)%45 -> slices 8+33,8+36,...: 41,44,47,50,53,56
    val fs = Multimodal.frameSample(ps, 2).getOrElse(fail("None for ps"))
    assert(fs.map(_.length) == Seq(41, 47, 53)) // pictures 1,3,5
    val kf = Multimodal.keyframes(es).getOrElse(fail("None for es"))
    assert(kf.map(_.length) == Seq(41, 50)) // pictures 1,4
  }
}
