package graft.ext

/** ISO-BMFF (MP4) container parsing — pure bytes, no codec.
  *
  * The box grammar is the PUBLIC ISO/IEC 14496-12 format: length-prefixed
  * nested boxes. Parsing ftyp / moov / mvhd / trak / tkhd / mdia / mdhd /
  * hdlr / stbl (stsd, stts, stss, stsz, stsc, stco/co64) recovers
  * everything frame sampling needs short of decoding pixels (which the
  * JDK has no codec for): track dimensions and codec fourcc, timing,
  * keyframe (sync-sample) positions, and the EXACT per-sample byte window
  * (file offset + size) of every frame. [[Multimodal.sampleFrames]] uses
  * those windows to cut real frame payloads at real frame boundaries;
  * only payloads this parser rejects fall back to the deterministic stub.
  *
  * The reference has no video story at all (it only ships video LINKS,
  * /root/reference/cc2dataset/main.py:83-90); this is a beyond-reference
  * capability for multimodal training-data pipelines.
  *
  * [[write]] is the inverse: a minimal muxer producing a valid
  * single-track file (ftyp + mdat + moov) from a spec. It exists so
  * fixtures and queries can build deterministic MP4s whose parsed
  * metadata is a closed-form function of the spec — i.e. expressible in
  * the DuckDB oracle — but it writes honest boxes a third-party demuxer
  * would accept.
  */
object Mp4 {

  /** One sample (frame): 1-based index, absolute byte window into the
    * file, and whether it is a sync sample (keyframe).
    */
  final case class Sample(index: Int, offset: Long, size: Long, sync: Boolean)

  final case class Track(
      handler: String, codec: String,
      width: Int, height: Int,
      timescale: Long, duration: Long,
      samples: Vector[Sample]) {
    def sampleCount: Int = samples.size
    def keyframeCount: Int = samples.count(_.sync)
  }

  final case class Meta(
      majorBrand: String, timescale: Long, duration: Long,
      tracks: Vector[Track]) {
    def videoTracks: Vector[Track] = tracks.filter(_.handler == "vide")
    def durationMs: Long =
      if (timescale == 0) 0L else duration * 1000L / timescale
  }

  /** Cheap sniff: a box whose type is 'ftyp' in the first slot. */
  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && tag(bytes, 4) == "ftyp"

  // --- byte readers (big-endian, per the spec) ---

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Child boxes of [start, end): (type, payloadStart, payloadEnd).
    * Malformed lengths (running past `end`, or smaller than their own
    * header) end iteration — the caller sees a shorter box list and
    * fails closed on whatever is then missing.
    */
  private def boxes(b: Array[Byte], start: Int,
      end: Int): Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
    private var pos = start
    def hasNext: Boolean = pos + 8 <= end
    def next(): (String, Int, Int) = {
      val size32 = u32(b, pos)
      val typ = tag(b, pos + 4)
      val (header, size) =
        if (size32 == 1L && pos + 16 <= end) (16, u64(b, pos + 8))
        else if (size32 == 0L) (8, (end - pos).toLong) // extends to end
        else (8, size32)
      val boxEnd = pos + size
      if (size < header || boxEnd > end || boxEnd <= pos) {
        pos = end // malformed: stop
        ("", end, end)
      } else {
        val out = (typ, pos + header, boxEnd.toInt)
        pos = boxEnd.toInt
        out
      }
    }
  }

  private def findBox(b: Array[Byte], start: Int, end: Int,
      typ: String): Option[(Int, Int)] =
    boxes(b, start, end).collectFirst { case (`typ`, s, e) => (s, e) }

  /** Parse the container. None for anything that is not a well-formed
    * single-moov MP4 with at least one complete sample table — the
    * honest signal for callers to fall back to the stub path.
    */
  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isMp4(bytes)) return None
      val top = boxes(bytes, 0, bytes.length).toVector
      val brand = top.collectFirst { case ("ftyp", s, e) if e - s >= 4 =>
        tag(bytes, s)
      }.getOrElse(return None)
      val (moovS, moovE) = top.collectFirst { case ("moov", s, e) => (s, e) }
        .getOrElse(return None)
      val (mvTs, mvDur) = findBox(bytes, moovS, moovE, "mvhd").map {
        case (s, _) =>
          bytes(s) match { // version
            case 1 => (u32(bytes, s + 20), u64(bytes, s + 24))
            case _ => (u32(bytes, s + 12), u32(bytes, s + 16))
          }
      }.getOrElse(return None)
      val tracks = boxes(bytes, moovS, moovE).collect {
        case ("trak", s, e) => parseTrak(bytes, s, e)
      }.flatten.toVector
      if (tracks.isEmpty) None
      else Some(Meta(brand, mvTs, mvDur, tracks))
    } catch { case _: Exception => None }

  private def parseTrak(b: Array[Byte], s: Int, e: Int): Option[Track] = {
    val (tkS, _) = findBox(b, s, e, "tkhd").getOrElse(return None)
    // tkhd: width/height are 16.16 fixed at the end of the (versioned) body
    val whOff = b(tkS) match {
      case 1 => tkS + 4 + 32 + 48 + 4 // vf + v1 timing/ids + layer..matrix
      case _ => tkS + 4 + 20 + 48 + 4
    }
    // layer(2) alt(2) volume(2) reserved(2) matrix(36) = 44; the +48/+4
    // split above keeps the v0/v1 timing delta in one place: timing/ids
    // v0 = creation4 mod4 id4 res4 dur4 = 20, v1 = 8+8+4+4+8 = 32; then
    // res(8) layer(2) alt(2) vol(2) res(2) matrix(36) = 52 → width
    val width = (u32(b, whOff) >> 16).toInt
    val height = (u32(b, whOff + 4) >> 16).toInt
    val (mdS, mdE) = findBox(b, s, e, "mdia").getOrElse(return None)
    val (ts, dur) = findBox(b, mdS, mdE, "mdhd").map { case (ms, _) =>
      b(ms) match {
        case 1 => (u32(b, ms + 20), u64(b, ms + 24))
        case _ => (u32(b, ms + 12), u32(b, ms + 16))
      }
    }.getOrElse(return None)
    val handler = findBox(b, mdS, mdE, "hdlr")
      .map { case (hs, _) => tag(b, hs + 8) }.getOrElse(return None)
    val (mnS, mnE) = findBox(b, mdS, mdE, "minf").getOrElse(return None)
    val (stS, stE) = findBox(b, mnS, mnE, "stbl").getOrElse(return None)
    val codec = findBox(b, stS, stE, "stsd")
      .filter { case (x, y) => y - x >= 16 }
      .map { case (x, _) => tag(b, x + 12) }.getOrElse(return None)
    samples(b, stS, stE).map(sm =>
      Track(handler, codec, width, height, ts, dur, sm))
  }

  /** Expand the four sample tables into absolute per-sample windows.
    * stsc runs give samples-per-chunk; stco/co64 give chunk starts; a
    * sample's offset is its chunk start plus the sizes of the samples
    * before it IN THAT CHUNK (14496-12 §8.7.4-8.7.5).
    */
  private def samples(b: Array[Byte], s: Int,
      e: Int): Option[Vector[Sample]] = {
    // Every entry count is validated against the enclosing box extent
    // BEFORE allocation. The tabulate paths would eventually AIOOBE (an
    // Exception parse() catches), but a hostile count reaching
    // Vector.fill first allocates count elements — u32 goes to ~2^32,
    // so one crafted stsz would throw OutOfMemoryError (an Error, NOT
    // caught by the Exception handler) and kill the executor instead
    // of failing closed. Bound first, allocate after.
    def entries(x: Int, end: Int, headerLen: Int, entryLen: Int): Option[Int] = {
      val n = u32(b, x + 4)
      val room = (end - x - headerLen).toLong / entryLen
      if (n < 0L || n > room) None else Some(n.toInt)
    }
    val sizes: Vector[Long] = findBox(b, s, e, "stsz").map { case (x, xe) =>
      val uniform = u32(b, x + 4)
      val n = u32(b, x + 8)
      if (uniform != 0L) {
        // uniform case: no table follows, so the box extent bounds
        // nothing — cap against the file itself (more samples than
        // payload bytes is never a well-formed progressive MP4)
        if (n < 0L || n > b.length) return None
        Vector.fill(n.toInt)(uniform)
      } else {
        if (n < 0L || n > (xe - x - 12).toLong / 4) return None
        Vector.tabulate(n.toInt)(i => u32(b, x + 12 + 4 * i))
      }
    }.getOrElse(return None)
    val chunkOffsets: Vector[Long] =
      findBox(b, s, e, "stco").map { case (x, xe) =>
        val n = entries(x, xe, 8, 4).getOrElse(return None)
        Vector.tabulate(n)(i => u32(b, x + 8 + 4 * i))
      }.orElse(findBox(b, s, e, "co64").map { case (x, xe) =>
        val n = entries(x, xe, 8, 8).getOrElse(return None)
        Vector.tabulate(n)(i => u64(b, x + 8 + 8 * i))
      }).getOrElse(return None)
    val stscRuns: Vector[(Int, Int)] = findBox(b, s, e, "stsc").map {
      case (x, xe) =>
        val n = entries(x, xe, 8, 12).getOrElse(return None)
        Vector.tabulate(n)(i => (u32(b, x + 8 + 12 * i).toInt,
          u32(b, x + 12 + 12 * i).toInt))
    }.getOrElse(return None)
    // stss is OPTIONAL: absent means every sample is a sync sample
    val sync: Int => Boolean = findBox(b, s, e, "stss") match {
      case Some((x, xe)) =>
        val n = entries(x, xe, 8, 4).getOrElse(return None)
        val set = (0 until n).map(i => u32(b, x + 8 + 4 * i).toInt).toSet
        set.contains _
      case None => _ => true
    }
    if (sizes.isEmpty || chunkOffsets.isEmpty || stscRuns.isEmpty) return None
    // samples-per-chunk for chunk c (1-based): the last stsc run whose
    // first_chunk <= c
    def perChunk(c: Int): Int =
      stscRuns.takeWhile(_._1 <= c).lastOption.map(_._2).getOrElse(0)
    val out = Vector.newBuilder[Sample]
    var sampleIdx = 0 // 0-based into sizes
    var chunk = 1
    while (sampleIdx < sizes.length && chunk <= chunkOffsets.length) {
      var within = 0L
      var k = 0
      val inChunk = perChunk(chunk)
      while (k < inChunk && sampleIdx < sizes.length) {
        val sz = sizes(sampleIdx)
        out += Sample(sampleIdx + 1, chunkOffsets(chunk - 1) + within, sz,
          sync(sampleIdx + 1))
        within += sz
        sampleIdx += 1
        k += 1
      }
      chunk += 1
    }
    val built = out.result()
    // fail closed if the tables disagree (stsc/stco ran out before stsz)
    if (built.length != sizes.length) None else Some(built)
  }

  // ------------------------------------------------------------------
  // Minimal muxer (the inverse function, used by fixtures and queries)
  // ------------------------------------------------------------------

  /** Spec of a single-video-track file. `fill(i)` is the payload byte
    * for 1-based sample i (each sample's window is filled with it, so a
    * reader can verify the parser's offsets point at the right bytes).
    * `syncEvery` marks 1-based samples 1, 1+k, 1+2k, ... as keyframes.
    */
  final case class BuildSpec(
      width: Int, height: Int,
      sampleSizes: Seq[Int],
      syncEvery: Int,
      timescale: Long = 1000L,
      sampleDelta: Long = 40L,
      samplesPerChunk: Int = 4,
      fill: Int => Byte = i => (i % 251).toByte,
      useCo64: Boolean = false,
      v1Timing: Boolean = false,
      includeStss: Boolean = true) // false: omit stss (= all sync)

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v)

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
    be32(8L + payload.length) ++ fourcc(typ) ++ payload
  }

  /** Serialize a valid single-track MP4 per `spec`: ftyp, mdat (sample
    * payloads back to back, chunked per `samplesPerChunk`), moov with
    * the full stbl. All timing boxes are version 0 unless `v1Timing`.
    */
  def write(spec: BuildSpec): Array[Byte] = {
    val n = spec.sampleSizes.length
    require(n > 0, "at least one sample")
    val ftyp = box("ftyp", fourcc("isom"), be32(0), fourcc("isom"))
    val mdatPayload = new Array[Byte](spec.sampleSizes.sum)
    var off = 0
    for (i <- 1 to n) {
      java.util.Arrays.fill(mdatPayload, off,
        off + spec.sampleSizes(i - 1), spec.fill(i))
      off += spec.sampleSizes(i - 1)
    }
    val mdat = box("mdat", mdatPayload)
    val firstSample = ftyp.length + 8L // mdat payload start
    // chunk layout: consecutive groups of samplesPerChunk samples
    val chunkSizes = spec.sampleSizes.grouped(spec.samplesPerChunk).toVector
    val chunkOffsets = chunkSizes.scanLeft(firstSample)((acc, g) =>
      acc + g.sum).init
    val duration = spec.sampleDelta * n

    val vf0 = be32(0) // version 0 + zero flags
    val identityMatrix = be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)
    val (timingVf, creation, dur) =
      if (spec.v1Timing)
        (Array[Byte](1, 0, 0, 0), be64(0L) ++ be64(0L), be64(duration))
      else (vf0, be32(0) ++ be32(0), be32(duration))

    val mvhd = box("mvhd", timingVf, creation, be32(spec.timescale), dur,
      be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0),
      identityMatrix, new Array[Byte](24), be32(2))
    val tkhd = box("tkhd",
      (if (spec.v1Timing) Array[Byte](1, 0, 0, 7)
       else Array[Byte](0, 0, 0, 7)),
      creation, be32(1), be32(0), dur,
      be32(0) ++ be32(0), be16(0), be16(0), be16(0), be16(0),
      identityMatrix,
      be32(spec.width.toLong << 16), be32(spec.height.toLong << 16))
    val mdhd = box("mdhd", timingVf, creation, be32(spec.timescale), dur,
      be16(0x55c4), be16(0))
    val hdlr = box("hdlr", vf0, be32(0), fourcc("vide"),
      new Array[Byte](12), Array[Byte](0))

    val sampleEntry = box("mp4v", new Array[Byte](6), be16(1),
      new Array[Byte](16), be16(spec.width), be16(spec.height),
      be32(0x00480000L), be32(0x00480000L), be32(0), be16(1),
      new Array[Byte](32), be16(24), be16(0xffff))
    val stsd = box("stsd", vf0, be32(1), sampleEntry)
    val stts = box("stts", vf0, be32(1), be32(n.toLong),
      be32(spec.sampleDelta))
    val syncIdx = (1 to n).filter(i => (i - 1) % spec.syncEvery == 0)
    val stss = box("stss", vf0, be32(syncIdx.length.toLong),
      syncIdx.toArray.flatMap(i => be32(i.toLong)))
    val stsz = box("stsz", vf0, be32(0), be32(n.toLong),
      spec.sampleSizes.toArray.flatMap(s => be32(s.toLong)))
    val stscRuns =
      if (n <= spec.samplesPerChunk || n % spec.samplesPerChunk == 0)
        Vector((1, math.min(n, spec.samplesPerChunk)))
      else Vector((1, spec.samplesPerChunk),
        (chunkSizes.length, n % spec.samplesPerChunk))
    val stsc = box("stsc", vf0, be32(stscRuns.length.toLong),
      stscRuns.toArray.flatMap { case (fc, spc) =>
        be32(fc.toLong) ++ be32(spc.toLong) ++ be32(1)
      })
    val stcoBox =
      if (spec.useCo64)
        box("co64", vf0, be32(chunkOffsets.length.toLong),
          chunkOffsets.toArray.flatMap(be64))
      else
        box("stco", vf0, be32(chunkOffsets.length.toLong),
          chunkOffsets.toArray.flatMap(be32))
    val stbl =
      if (spec.includeStss) box("stbl", stsd, stts, stss, stsz, stsc, stcoBox)
      else box("stbl", stsd, stts, stsz, stsc, stcoBox)
    val vmhd = box("vmhd", Array[Byte](0, 0, 0, 1),
      be16(0), be16(0), be16(0), be16(0))
    val dinf = box("dinf", box("dref", vf0, be32(1),
      box("url ", Array[Byte](0, 0, 0, 1))))
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }
}
