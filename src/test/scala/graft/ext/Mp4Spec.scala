package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** ISO-BMFF parser/muxer: roundtrip over varied geometries, both chunk
  * offset widths (stco/co64), both timing versions (v0/v1), the
  * stss-absent all-sync rule, hostile input rejection, and — because
  * roundtrips can't catch a shared misunderstanding of the format — a
  * structural golden: pinned byte offsets and md5 of one built file,
  * hand-verified against ISO/IEC 14496-12 box layout.
  */
class Mp4Spec extends AnyFunSuite with SparkTestBase {

  private def spec(n: Int, spc: Int = 4, co64: Boolean = false,
      v1: Boolean = false, stss: Boolean = true) = Mp4.BuildSpec(
    width = 320, height = 176,
    sampleSizes = (1 to n).map(i => 50 + i % 64),
    syncEvery = 3, samplesPerChunk = spc,
    fill = i => (i % 251).toByte,
    useCo64 = co64, v1Timing = v1, includeStss = stss)

  private def roundtrip(s: Mp4.BuildSpec): Mp4.Track = {
    val bytes = Mp4.write(s)
    assert(Mp4.isMp4(bytes))
    val meta = Mp4.parse(bytes).getOrElse(fail("parse returned None"))
    assert(meta.majorBrand == "isom")
    assert(meta.timescale == s.timescale)
    assert(meta.duration == s.sampleDelta * s.sampleSizes.length)
    assert(meta.durationMs == s.sampleDelta * s.sampleSizes.length *
      1000 / s.timescale)
    val t = meta.videoTracks.headOption.getOrElse(fail("no video track"))
    assert(t.handler == "vide")
    assert(t.codec == "mp4v")
    assert(t.width == s.width && t.height == s.height)
    assert(t.sampleCount == s.sampleSizes.length)
    assert(t.samples.map(_.size) == s.sampleSizes.map(_.toLong).toVector)
    // the decisive check: every declared window holds the fill byte of
    // exactly its sample — proves stsc/stco/stsz offset math, not just
    // field echoes
    for (smp <- t.samples) {
      val w = bytes.slice(smp.offset.toInt, (smp.offset + smp.size).toInt)
      assert(w.length == smp.size)
      assert(w.forall(_ == s.fill(smp.index)),
        s"sample ${smp.index} window reads the wrong bytes")
    }
    t
  }

  test("roundtrip: single sample, multi-chunk, ragged last chunk") {
    for (n <- Seq(1, 4, 7, 19)) {
      val t = roundtrip(spec(n))
      assert(t.keyframeCount == (n + 2) / 3)
      assert(t.samples.filter(_.sync).map(_.index) ==
        (1 to n by 3).toVector)
    }
  }

  test("co64 (64-bit chunk offsets) parses identically to stco") {
    val a = roundtrip(spec(10))
    val b = roundtrip(spec(10, co64 = true))
    assert(a.samples.map(s => (s.index, s.size, s.sync)) ==
      b.samples.map(s => (s.index, s.size, s.sync)))
  }

  test("version-1 timing boxes (64-bit times) parse identically to v0") {
    val a = roundtrip(spec(7))
    val b = roundtrip(spec(7, v1 = true))
    assert(a.width == b.width && a.height == b.height)
    assert(a.timescale == b.timescale && a.duration == b.duration)
  }

  test("absent stss means every sample is a sync sample (14496-12)") {
    val t = roundtrip(spec(7, stss = false))
    assert(t.keyframeCount == 7)
    assert(t.samples.forall(_.sync))
  }

  test("hostile input fails closed: None, never a throw") {
    val good = Mp4.write(spec(7))
    assert(Mp4.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4.parse("not a video at all".getBytes("UTF-8")).isEmpty)
    assert(!Mp4.isMp4("plain text".getBytes("UTF-8")))
    // truncations at every box-ish granularity
    for (cut <- Seq(4, 11, 20, good.length / 2, good.length - 8))
      assert(Mp4.parse(good.take(cut)).isEmpty, s"cut=$cut must be None")
    // bit-flip the moov length field region: must not throw
    val flipped = good.clone()
    flipped(good.length - 30) = 0xff.toByte
    Mp4.parse(flipped) // any Option is fine; no exception is the assert
  }

  /** Byte offset of the first box whose fourcc is `typ` (tag position,
    * i.e. payload starts at +4). Test-side search; fine on fixtures.
    */
  private def tagIndexOf(b: Array[Byte], typ: String): Int = {
    val t = typ.getBytes("US-ASCII")
    (0 to b.length - 4).find(i =>
      b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3))
      .getOrElse(fail(s"no $typ box in fixture"))
  }

  private def putU32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = ((v >> 24) & 0xff).toByte
    b(i + 1) = ((v >> 16) & 0xff).toByte
    b(i + 2) = ((v >> 8) & 0xff).toByte
    b(i + 3) = (v & 0xff).toByte
  }

  test("hostile stsz counts fail closed BEFORE allocation (no OOM-class " +
      "Error escapes parse)") {
    // uniform-size path: count is attacker bytes and no table bounds
    // it — unpatched, Vector.fill(count) allocates ~2^31 elements and
    // dies with OutOfMemoryError (an Error, so the Exception handler
    // never sees it). The parser must bound count first and return None.
    val uniform = Mp4.write(spec(7))
    val uz = tagIndexOf(uniform, "stsz")
    putU32(uniform, uz + 8, 1000L)        // sample_size: nonzero => uniform
    putU32(uniform, uz + 12, 0x7fffffffL) // sample_count: hostile
    assert(Mp4.parse(uniform).isEmpty, "hostile uniform stsz must be None")
    // non-uniform path: count far past the box extent must be rejected
    // by the extent check (not by a 2-billion-step tabulate)
    val tabled = Mp4.write(spec(7))
    val tz = tagIndexOf(tabled, "stsz")
    putU32(tabled, tz + 12, 0x7fffffffL)
    assert(Mp4.parse(tabled).isEmpty, "hostile tabled stsz must be None")
    // and the other tables: stco / stsc / stss counts past their boxes
    for (boxTag <- Seq("stco", "stsc", "stss")) {
      val f = Mp4.write(spec(7))
      val i = tagIndexOf(f, boxTag)
      putU32(f, i + 8, 0x7fffffffL) // entry_count after version+flags
      assert(Mp4.parse(f).isEmpty, s"hostile $boxTag count must be None")
    }
  }

  test("truncated payload (windows past the end) is unparseable for the " +
      "frame cutters: None + stub fallback, never a partial frame set") {
    // moov-first-equivalent: the sample TABLES stay intact, but one
    // declared window runs past the payload — patch sample 1's size in
    // the stsz table to 16 MiB. Silently cutting the in-range suffix
    // would renumber frames; the contract is fail-closed.
    val b = Mp4.write(spec(7))
    val z = tagIndexOf(b, "stsz")
    putU32(b, z + 16, 0x01000000L) // first table entry (z+4 vf, +8 uniform, +12 count)
    assert(Mp4.parse(b).nonEmpty, "tables are intact: container parses")
    assert(Multimodal.frameSample(b, 1).isEmpty,
      "frameSample must reject a truncated container")
    assert(Multimodal.keyframes(b).isEmpty,
      "keyframes must reject a truncated container")
    import spark.implicits._
    val media = spark.createDataset(Seq((9L, b, "video/mp4")))
      .toDF("doc_id", "bytes", "mime")
    assert(Multimodal.videoMeta(media).collect().isEmpty,
      "videoMeta must drop the truncated row")
    // sampleFrames stays total via the stub
    assert(Multimodal.sampleFrames(media, 2).count() > 0)
  }

  // ---- fragmented (moof/traf/trun) ----

  private def fragSpec(frags: Seq[Int], explicitBase: Boolean = false,
      truns: Int = 1, elst: Long = -1L, syncEvery: Int = 3) =
    Mp4.FragBuildSpec(
      width = 320, height = 176,
      fragmentSizes = {
        var g = 0
        frags.map { k => val s = (1 to k).map(i => 50 + (g + i) % 64); g += k; s }
      },
      syncEvery = syncEvery,
      fill = i => (i % 251).toByte,
      explicitBaseOffset = explicitBase,
      trunsPerFragment = truns,
      elstMediaTime = elst)

  private def fragRoundtrip(s: Mp4.FragBuildSpec): Mp4.Track = {
    val bytes = Mp4.writeFragmented(s)
    assert(Mp4.isMp4(bytes))
    val meta = Mp4.parse(bytes).getOrElse(fail("frag parse returned None"))
    assert(meta.majorBrand == "iso5")
    val n = s.fragmentSizes.map(_.size).sum
    assert(meta.durationMs == s.sampleDelta * n * 1000 / s.timescale,
      "movie duration must derive from fragment runs when mvhd says 0")
    val t = meta.videoTracks.headOption.getOrElse(fail("no video track"))
    assert(t.fragmented)
    assert(t.width == s.width && t.height == s.height)
    assert(t.sampleCount == n)
    assert(t.duration == s.sampleDelta * n)
    val wantSizes = s.fragmentSizes.flatten.map(_.toLong).toVector
    assert(t.samples.map(_.size) == wantSizes)
    assert(t.samples.map(_.index) == (1 to n).toVector)
    assert(t.samples.map(_.sync) ==
      (1 to n).map(i => (i - 1) % s.syncEvery == 0).toVector)
    // decisive: every declared window reads back exactly its fill byte
    for (smp <- t.samples) {
      val w = bytes.slice(smp.offset.toInt, (smp.offset + smp.size).toInt)
      assert(w.length == smp.size)
      assert(w.forall(_ == s.fill(smp.index)),
        s"frag sample ${smp.index} window reads the wrong bytes")
    }
    t
  }

  test("fragmented roundtrip: multi-fragment, default-base-is-moof, " +
      "compact first-sample-flags (syncs head the fragments)") {
    // 3-sample fragments with syncEvery=3: every fragment starts with
    // a keyframe -> the muxer writes the compact flag form
    fragRoundtrip(fragSpec(Seq(3, 3, 3)))
  }

  test("fragmented roundtrip: per-sample flags (syncs mid-fragment), " +
      "ragged fragment lengths") {
    fragRoundtrip(fragSpec(Seq(4, 1, 5, 2)))
  }

  test("fragmented roundtrip: explicit tfhd base_data_offset") {
    fragRoundtrip(fragSpec(Seq(3, 6), explicitBase = true))
  }

  test("fragmented roundtrip: multiple truns per fragment (continuation " +
      "cursor, no data offset on later truns)") {
    fragRoundtrip(fragSpec(Seq(6, 9), truns = 3))
    fragRoundtrip(fragSpec(Seq(7), truns = 2)) // ragged split
  }

  test("elst: mediaTimeOffset surfaces the edit list's media_time; " +
      "byte windows are unmoved") {
    val withElst = fragRoundtrip(fragSpec(Seq(3, 3), elst = 80L))
    assert(withElst.mediaTimeOffset == 80L)
    val without = fragRoundtrip(fragSpec(Seq(3, 3)))
    assert(without.mediaTimeOffset == 0L)
    assert(withElst.samples.map(_.size) == without.samples.map(_.size))
    // progressive files default to 0 too
    assert(roundtrip(spec(5)).mediaTimeOffset == 0L)
  }

  test("fragmented hostile input fails closed: truncations at moof/trun " +
      "granularity and hostile trun sample_count") {
    val good = Mp4.writeFragmented(fragSpec(Seq(3, 3, 3)))
    for (cut <- Seq(4, 11, 20, good.length / 3, good.length / 2,
        good.length - 8))
      Mp4.parse(good.take(cut)) // no throw; partial moofs may drop
    // hostile trun sample_count: bound must reject before looping
    val evil = good.clone()
    val tz = tagIndexOf(evil, "trun")
    putU32(evil, tz + 8, 0x7fffffffL)
    assert(Mp4.parse(evil).isEmpty ||
      Mp4.parse(evil).get.videoTracks.forall(_.samples.size < 10),
      "hostile trun count must not be believed")
    // frame cutters treat a truncated frag file as unparseable
    val shortened = good.take(good.length - 8)
    assert(Multimodal.frameSample(shortened, 1).forall(_ => true)) // no throw
  }

  test("structural golden: pinned offsets + md5 (hand-checked box layout)") {
    val s = Mp4.BuildSpec(width = 320, height = 176,
      sampleSizes = Seq(10, 20, 30), syncEvery = 3, samplesPerChunk = 2,
      fill = i => i.toByte)
    val b = Mp4.write(s)
    def tag(i: Int) = new String(b, i, 4, "US-ASCII")
    // ftyp: 20 bytes (8 header + major + minor + 1 compatible brand)
    assert(tag(4) == "ftyp" && tag(8) == "isom")
    assert(((b(0) & 0xff) << 24 | (b(1) & 0xff) << 16 |
      (b(2) & 0xff) << 8 | (b(3) & 0xff)) == 20)
    // mdat directly after: payload = 60 bytes -> box size 68 at offset 20
    assert(tag(24) == "mdat")
    // first sample starts at 28 (pinned: this is what stco must record)
    assert(b(28) == 1.toByte && b(28 + 9) == 1.toByte) // sample 1 fill
    assert(b(38) == 2.toByte)                          // sample 2 fill
    assert(tag(92) == "moov")                          // 20 + 68 + 4
    val md = java.security.MessageDigest.getInstance("MD5")
    val got = md.digest(b).map("%02x".format(_)).mkString
    assert(got == "bb7f6ed18745c8cad0c03e3fdbfa5664",
      s"built bytes drifted: $got")
  }

  test("multi-track container: videoTracks selects the vide trak, the " +
      "spliced soun trak parses alongside") {
    // build a single-track file, then splice a SECOND trak into moov by
    // duplicating the trak box with its hdlr handler patched to 'soun'
    // — hand byte surgery, so the parser sees a genuinely multi-trak
    // moov it did not write
    val b = Mp4.write(spec(5))
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(a: Array[Byte], i: Int) =
      ((a(i) & 0xffL) << 24) | ((a(i + 1) & 0xffL) << 16) |
        ((a(i + 2) & 0xffL) << 8) | (a(i + 3) & 0xffL)
    def findTop(a: Array[Byte], typ: String): Int = {
      var p = 0
      while (p + 8 <= a.length) {
        if (new String(a, p + 4, 4, "US-ASCII") == typ) return p
        p += u32(a, p).toInt
      }
      fail(s"no $typ box")
    }
    val moovAt = findTop(b, "moov")
    val moovEnd = moovAt + u32(b, moovAt).toInt
    // trak is a child of moov: scan children
    var p = moovAt + 8
    while (new String(b, p + 4, 4, "US-ASCII") != "trak")
      p += u32(b, p).toInt
    val trakLen = u32(b, p).toInt
    val soun = java.util.Arrays.copyOfRange(b, p, p + trakLen)
    // patch its handler fourcc: 'vide' -> 'soun' (inside hdlr)
    val vi = {
      var i = 0
      var at = -1
      while (at < 0 && i < soun.length - 4) {
        if (new String(soun, i, 4, "US-ASCII") == "vide") at = i
        i += 1
      }
      at
    }
    assert(vi > 0)
    System.arraycopy("soun".getBytes("US-ASCII"), 0, soun, vi, 4)
    val spliced = new Array[Byte](b.length + trakLen)
    System.arraycopy(b, 0, spliced, 0, moovEnd)
    System.arraycopy(soun, 0, spliced, moovEnd, trakLen)
    System.arraycopy(b, moovEnd, spliced, moovEnd + trakLen,
      b.length - moovEnd)
    // grow the moov length to cover the appended child
    System.arraycopy(be32(u32(b, moovAt) + trakLen), 0, spliced, moovAt, 4)
    val meta = Mp4.parse(spliced).getOrElse(fail("spliced parse"))
    assert(meta.tracks.map(_.handler) == Vector("vide", "soun"))
    assert(meta.videoTracks.map(_.handler) == Vector("vide"))
    assert(meta.tracks.forall(_.sampleCount == 5))
  }

  test("sampleFrames cuts real container windows for MP4 media, stub " +
      "only for non-video payloads") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val media = spark.createDataset(Seq(
      (1L, Mp4.write(spec(7)), "video/mp4"),
      (2L, "just some text bytes, definitely not a container".getBytes("UTF-8"),
        "text/plain")))
      .toDF("doc_id", "bytes", "mime")
    val frames = Multimodal.sampleFrames(media, stride = 2)
      .select("doc_id", "frame_idx", "frame")
      .as[(Long, Long, Array[Byte])].collect().toSeq
    // doc 1: samples 1,3,5,7 -> sizes 51,53,55,57, content = fill byte
    val real = frames.filter(_._1 == 1L).sortBy(_._2)
    assert(real.map(_._3.length) == Seq(51, 53, 55, 57))
    assert(real.zip(Seq(1, 3, 5, 7)).forall { case ((_, _, f), i) =>
      f.forall(_ == (i % 251).toByte)
    })
    // doc 2: stub path (64-byte windows of the raw payload)
    val stub = frames.filter(_._1 == 2L)
    assert(stub.nonEmpty && stub.forall(_._3.length <= 64))
  }

  test("keyframes() returns exactly the sync-sample windows") {
    val bytes = Mp4.write(spec(10))
    val kf = Multimodal.keyframes(bytes).getOrElse(fail("None for valid mp4"))
    assert(kf.map(_.length) == Seq(51, 54, 57, 60)) // samples 1,4,7,10
    assert(Multimodal.keyframes("nope".getBytes("UTF-8")).isEmpty)
  }
  test("fragmented: a moof with a 64-bit largesize header positions " +
      "default-base-is-moof at the box START (not start+8... wrong)") {
    // convert the FIRST moof of a valid fragmented file to the
    // largesize form: header grows 8 -> 16 bytes, so the moof-relative
    // trun data_offset must grow by 8 too. A parser assuming compact
    // headers computes moofStart 8 bytes late and cuts in-range but
    // WRONG windows -- the fill-byte readback below catches that.
    val spec = fragSpec(Seq(3, 3, 3))
    val orig = Mp4.writeFragmented(spec)
    def u32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    def putU32(b: Array[Byte], i: Int, v: Long): Unit = {
      b(i) = ((v >> 24) & 0xff).toByte; b(i + 1) = ((v >> 16) & 0xff).toByte
      b(i + 2) = ((v >> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
    }
    // locate the first top-level moof
    var pos = 0
    while (new String(orig, pos + 4, 4, "US-ASCII") != "moof")
      pos += u32(orig, pos).toInt
    val moofSize = u32(orig, pos)
    val bytes = new Array[Byte](orig.length + 8)
    System.arraycopy(orig, 0, bytes, 0, pos)
    putU32(bytes, pos, 1L) // size32 = 1: largesize follows the type
    System.arraycopy("moof".getBytes("US-ASCII"), 0, bytes, pos + 4, 4)
    putU32(bytes, pos + 8, 0L)
    putU32(bytes, pos + 12, moofSize + 8) // 64-bit size, high word 0
    System.arraycopy(orig, pos + 8, bytes, pos + 16, orig.length - pos - 8)
    // patch the first trun's data_offset (+8: the header grew under it)
    var tp = pos + 16
    while (new String(bytes, tp + 4, 4, "US-ASCII") != "trun") tp += 1
    val offPos = tp + 8 + 8 // past header(8), version/flags(4), count(4)
    putU32(bytes, offPos, u32(bytes, offPos) + 8)
    val meta = Mp4.parse(bytes).getOrElse(fail("largesize parse None"))
    val t = meta.videoTracks.headOption.getOrElse(fail("no video track"))
    assert(t.sampleCount == 9)
    for (smp <- t.samples) {
      val w = bytes.slice(smp.offset.toInt, (smp.offset + smp.size).toInt)
      assert(w.length == smp.size && w.forall(_ == spec.fill(smp.index)),
        s"largesize-moof sample ${smp.index} window reads the wrong bytes")
    }
  }

  test("hostile counts with no box-extent bound are capped: uniform " +
      "stsz and field-less trun runs fail closed before allocation") {
    // uniform stsz: count must be bounded by fileLen / uniformSize
    val host = Mp4.write(Mp4.BuildSpec(width = 32, height = 16,
      sampleSizes = Seq(40, 40, 40, 40), syncEvery = 2))
    var sp = -1
    for (i <- 0 until host.length - 4)
      if (sp < 0 && new String(host, i, 4, "US-ASCII") == "stsz") sp = i
    assert(sp > 0)
    val bad = host.clone()
    def putU32(b: Array[Byte], i: Int, v: Long): Unit = {
      b(i) = ((v >> 24) & 0xff).toByte; b(i + 1) = ((v >> 16) & 0xff).toByte
      b(i + 2) = ((v >> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
    }
    putU32(bad, sp + 8, 4L)                 // uniform size 4
    putU32(bad, sp + 12, bad.length / 2L)   // count: 2x what 4-byte
    assert(Mp4.parse(bad).isEmpty)          // samples could occupy
    val bad2 = host.clone()
    putU32(bad2, sp + 8, 1L)
    putU32(bad2, sp + 12, 0x7fffff00L)      // near-2^31 boxed alloc
    assert(Mp4.parse(bad2).isEmpty)
  }
}
