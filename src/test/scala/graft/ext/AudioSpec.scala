package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Audio header parsers/muxers (MP3 frame walk, FLAC STREAMINFO, OGG
  * pages with Vorbis/Opus id headers, WAV): roundtrips with exact
  * duration arithmetic, dispatch via Audio.parse, hostile input
  * rejection.
  */
class AudioSpec extends AnyFunSuite with SparkTestBase {

  test("mp3 roundtrip: frame count, rate, channels, duration") {
    val b = Audio.writeMp3(frames = 5, bitrateIdx = 9, rateIdx = 0,
      mono = false)
    val i = Audio.parseMp3(b).getOrElse(fail("None for valid mp3"))
    assert(i.format == "mp3" && i.codec == "mp3")
    assert(i.sampleRate == 44100L && i.channels == 2L && i.units == 5L)
    assert(i.durationMs == 5L * 1152 * 1000 / 44100) // 130
    // frame length pinned: 144 * 128000 / 44100 = 417
    assert(b.length == 5 * 417)
    val mono = Audio.parseMp3(Audio.writeMp3(3, 11, 2, mono = true)).get
    assert(mono.channels == 1L && mono.sampleRate == 32000L &&
      mono.units == 3L)
  }

  test("flac roundtrip: bit-packed STREAMINFO incl. >16-bit totals") {
    val b = Audio.writeFlac(rate = 48000, channels = 2,
      totalSamples = 123456789L)
    val i = Audio.parseFlac(b).getOrElse(fail("None for valid flac"))
    assert(i.format == "flac" && i.sampleRate == 48000L &&
      i.channels == 2L && i.units == 123456789L)
    assert(i.durationMs == 123456789L * 1000 / 48000)
    val odd = Audio.parseFlac(Audio.writeFlac(32000, 1, 5000L)).get
    assert(odd.channels == 1L && odd.durationMs == 5000L * 1000 / 32000)
  }

  test("ogg vorbis: duration from the final granule at the id-header rate") {
    val b = Audio.writeOgg(opus = false, channels = 2, rate = 44100L,
      preSkip = 0, finalGranule = 44100L * 3, dataPages = 4)
    val i = Audio.parseOgg(b).getOrElse(fail("None for valid ogg"))
    assert(i.format == "ogg" && i.codec == "vorbis")
    assert(i.sampleRate == 44100L && i.channels == 2L && i.units == 5L)
    assert(i.durationMs == 3000L)
  }

  test("ogg opus: 48 kHz granule ticks minus pre-skip (RFC 7845)") {
    val b = Audio.writeOgg(opus = true, channels = 2, rate = 48000L,
      preSkip = 312, finalGranule = 312L + 960 * 4, dataPages = 2)
    val i = Audio.parseOgg(b).getOrElse(fail("None for valid opus"))
    assert(i.codec == "opus" && i.units == 3L)
    assert(i.durationMs == 960L * 4 * 1000 / 48000) // 80 ms
  }

  test("wav rides the RIFF parser") {
    val b = Audio.writeWav(rate = 16000, channels = 2, nPerChannel = 400)
    val i = Audio.parseWav(b).getOrElse(fail("None for valid wav"))
    assert(i.format == "wav" && i.codec == "pcm_s16le")
    assert(i.sampleRate == 16000L && i.channels == 2L && i.units == 400L)
    assert(i.durationMs == 400L * 1000 / 16000) // 25 ms
  }

  test("m4a rides the ISO-BMFF parser: soun track channels/rate from the " +
      "mp4a AudioSampleEntry, duration from the media timescale") {
    val b = Mp4.write(Mp4.BuildSpec(width = 0, height = 0,
      sampleSizes = (1 to 9).map(i => 40 + i), syncEvery = 1,
      includeStss = false, timescale = 44100L, sampleDelta = 1024L,
      audio = true, channels = 1))
    val i = Audio.parseM4a(b).getOrElse(fail("None for valid m4a"))
    assert(i.format == "m4a" && i.codec == "mp4a")
    assert(i.sampleRate == 44100L && i.channels == 1L && i.units == 9L)
    assert(i.durationMs == 9L * 1024 * 1000 / 44100) // 208 ms
    assert(Audio.parse(b).get.format == "m4a")
    // an m4a is NOT a video: the video cutters must not claim it
    assert(Multimodal.keyframes(b).isEmpty)
    // and a VIDEO mp4 is not audio
    val vid = Mp4.write(Mp4.BuildSpec(width = 64, height = 48,
      sampleSizes = Seq(50, 51), syncEvery = 3))
    assert(Audio.parseM4a(vid).isEmpty)
  }

  test("Audio.parse dispatches on magic; hostile input fails closed") {
    assert(Audio.parse(Audio.writeMp3(2, 9, 0, mono = true)).get.format == "mp3")
    assert(Audio.parse(Audio.writeFlac(44100, 1, 100L)).get.format == "flac")
    assert(Audio.parse(Audio.writeOgg(opus = false, 2, 44100L, 0, 4410L,
      1)).get.format == "ogg")
    assert(Audio.parse(Audio.writeWav(8000, 1, 10)).get.format == "wav")
    assert(Audio.parse(Array.emptyByteArray).isEmpty)
    assert(Audio.parse("definitely not audio".getBytes("UTF-8")).isEmpty)
    for (good <- Seq(Audio.writeMp3(4, 9, 0, mono = false),
        Audio.writeFlac(44100, 2, 9999L),
        Audio.writeOgg(opus = true, 2, 48000L, 312, 1272L, 2),
        Audio.writeWav(8000, 2, 50))) {
      for (cut <- Seq(1, 3, 10, good.length / 2, good.length - 3))
        Audio.parse(good.take(cut)) // no throw is the assertion
      val flipped = good.clone()
      for (i <- Seq(0, 2, good.length / 3)) flipped(i) = 0x55.toByte
      Audio.parse(flipped) // no throw
    }
  }

  test("audioMeta stage: mixed-format corpus through one pass, non-audio " +
      "rows dropped") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      (0L, Audio.writeMp3(3, 9, 0, mono = true), "audio/mpeg"),
      (1L, Audio.writeWav(8000, 1, 200), "audio/wav"),
      (2L, Audio.writeFlac(32000, 1, 5026L), "audio/flac"),
      (3L, Audio.writeOgg(opus = false, 2, 44100L, 0, 4410L * 5, 2),
        "audio/ogg"),
      (4L, "plain text".getBytes("UTF-8"), "text/plain")))
      .toDF("doc_id", "bytes", "mime")
    val rows = Multimodal.audioMeta(media).collect().sortBy(_.doc_id)
    assert(rows.map(_.doc_id).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.format).toSeq == Seq("mp3", "wav", "flac", "ogg"))
    assert(rows(3).duration_ms == 500L)
  }
  test("ID3v2.4 footer flag: the 10 extra bytes the syncsafe size " +
      "excludes are skipped (a valid MP3 is not rejected)") {
    val plain = Audio.writeMp3(4, 9, 0, mono = false, id3Bytes = 47)
    val footed = Audio.writeMp3(4, 9, 0, mono = false, id3Bytes = 47,
      id3Footer = true)
    assert(footed.length == plain.length + 10)
    val i = Audio.parseMp3(footed).getOrElse(
      fail("footer tag rejected a valid MP3"))
    assert(i.units == 4L && i.sampleRate == 44100L && i.channels == 2L)
    assert(Audio.parseMp3(plain).get == i)
  }

  test("VBR: Xing frame count is the duration authority (walked count " +
      "would include the header frame)") {
    val b = Audio.writeMp3Vbr(bitrateIdxs = Seq(9, 12, 10, 14, 9),
      rateIdx = 0, mono = false)
    val i = Audio.parseMp3(b).getOrElse(fail("None for valid VBR mp3"))
    assert(i.units == 5L, "must be the Xing count, not 6 walked frames")
    assert(i.durationMs == 5L * 1152 * 1000 / 44100)
    assert(i.sampleRate == 44100L && i.channels == 2L)
    // mono variant: side info is 17 bytes, Xing sits earlier
    val m = Audio.parseMp3(Audio.writeMp3Vbr(Seq(10, 13), 1,
      mono = true)).getOrElse(fail("None for mono VBR"))
    assert(m.units == 2L && m.channels == 1L && m.sampleRate == 48000L)
    // an Info tag (CBR files written by LAME) takes the same path
    val info = b.clone()
    var si = -1
    for (i2 <- 0 until info.length - 4)
      if (si < 0 && new String(info, i2, 4, "US-ASCII") == "Xing") si = i2
    System.arraycopy("Info".getBytes("US-ASCII"), 0, info, si, 4)
    assert(Audio.parseMp3(info).get.units == 5L)
  }
}
