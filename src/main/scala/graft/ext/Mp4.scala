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

  /** `trackId` is tkhd's track_ID (the join key for movie fragments).
    * `mediaTimeOffset` is the first non-empty edit's media_time from
    * the track's edit list (elst), 0 when no edit list is present —
    * the initial composition shift a PLAYER applies to presentation
    * times. It is surfaced for metadata completeness only: frame
    * sampling and keyframe cutting operate on DECODE-order byte
    * windows, which elst does not move, so none of the cutters consult
    * it (deriving per-sample presentation stamps would).
    */
  final case class Track(
      handler: String, codec: String,
      width: Int, height: Int,
      timescale: Long, duration: Long,
      samples: Vector[Sample],
      trackId: Long = 0L,
      mediaTimeOffset: Long = 0L,
      fragmented: Boolean = false,
      channels: Int = 0,      // audio (soun) sample entries only
      sampleRate: Long = 0L) { // 16.16 integer part, audio entries only
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

  /** Absolute sample-count ceiling for counts the box extent cannot
    * bound (uniform stsz, field-less trun runs). 2^22 samples is ~19h
    * of 60 fps video — far past anything parsed in-memory — and caps
    * the boxed-element allocation a crafted count can force even when
    * the per-payload-byte bound degenerates (1-byte uniform samples).
    */
  private val MaxSamples = 1 << 22

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

  /** Child boxes of [start, end): (type, payloadStart, payloadEnd,
    * headerLen). The header length matters to fragment parsing: a moof
    * written with a 64-bit largesize header starts 16 bytes before its
    * payload, not 8, and the default-base-is-moof convention points at
    * the box START — assuming a compact header there would yield
    * in-range but wrong sample windows. Malformed lengths (running past
    * `end`, or smaller than their own header) end iteration — the
    * caller sees a shorter box list and fails closed on whatever is
    * then missing.
    */
  private def boxesH(b: Array[Byte], start: Int,
      end: Int): Iterator[(String, Int, Int, Int)] =
    new Iterator[(String, Int, Int, Int)] {
      private var pos = start
      def hasNext: Boolean = pos + 8 <= end
      def next(): (String, Int, Int, Int) = {
        val size32 = u32(b, pos)
        val typ = tag(b, pos + 4)
        val (header, size) =
          if (size32 == 1L && pos + 16 <= end) (16, u64(b, pos + 8))
          else if (size32 == 0L) (8, (end - pos).toLong) // extends to end
          else (8, size32)
        val boxEnd = pos + size
        if (size < header || boxEnd > end || boxEnd <= pos) {
          pos = end // malformed: stop
          ("", end, end, 8)
        } else {
          val out = (typ, pos + header, boxEnd.toInt, header)
          pos = boxEnd.toInt
          out
        }
      }
    }

  private def boxes(b: Array[Byte], start: Int,
      end: Int): Iterator[(String, Int, Int)] =
    boxesH(b, start, end).map { case (t, s, e, _) => (t, s, e) }

  private def findBox(b: Array[Byte], start: Int, end: Int,
      typ: String): Option[(Int, Int)] =
    boxes(b, start, end).collectFirst { case (`typ`, s, e) => (s, e) }

  /** Parse the container — progressive (moov sample tables) AND
    * fragmented (moov/mvex declaring defaults, samples carried in
    * moof/traf/trun movie fragments, the layout streaming-era encoders
    * actually emit). None for anything that is not a well-formed MP4
    * with at least one complete sample table or fragment run — the
    * honest signal for callers to fall back to the stub path.
    *
    * Fragmented specifics (14496-12 §8.8):
    *  - mvex/trex records per-track defaults (duration/size/flags);
    *  - each moof's traf carries tfhd (per-fragment defaults + base
    *    data offset) and trun boxes (per-sample runs). The base data
    *    offset is tfhd's explicit base_data_offset when present,
    *    otherwise the enclosing moof's first byte — which covers both
    *    the default-base-is-moof flag and the first-traf default; a
    *    multi-traf fragment relying on the "end of previous traf data"
    *    legacy default is not reconstructed (fails closed per traf);
    *  - sync = !(sample_flags & 0x10000) from, in precedence order,
    *    the per-sample trun flags, trun first-sample-flags (first
    *    sample only), tfhd default, trex default;
    *  - a track's duration is the sum of its fragment sample durations
    *    (mdhd declares 0 in fragmented files), and when mvhd's movie
    *    duration is 0 it is derived from the longest track.
    */
  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isMp4(bytes)) return None
      val top = boxesH(bytes, 0, bytes.length).toVector
      val brand = top.collectFirst { case ("ftyp", s, e, _) if e - s >= 4 =>
        tag(bytes, s)
      }.getOrElse(return None)
      val (moovS, moovE) = top.collectFirst { case ("moov", s, e, _) => (s, e) }
        .getOrElse(return None)
      val (mvTs, mvDur) = findBox(bytes, moovS, moovE, "mvhd").map {
        case (s, _) =>
          bytes(s) match { // version
            case 1 => (u32(bytes, s + 20), u64(bytes, s + 24))
            case _ => (u32(bytes, s + 12), u32(bytes, s + 16))
          }
      }.getOrElse(return None)
      // mvex marks the file as fragmented; trex carries per-track
      // defaults: track_ID(+4) descIdx(+8) duration(+12) size(+16)
      // flags(+20) after the version/flags word
      val trexMap: Map[Long, (Long, Long, Long)] =
        findBox(bytes, moovS, moovE, "mvex").map { case (xs, xe) =>
          boxes(bytes, xs, xe).collect { case ("trex", x, _) =>
            u32(bytes, x + 4) ->
              ((u32(bytes, x + 12), u32(bytes, x + 16), u32(bytes, x + 20)))
          }.toMap
        }.getOrElse(Map.empty)
      val fragmented = trexMap.nonEmpty
      val base = boxes(bytes, moovS, moovE).collect {
        case ("trak", s, e) => parseTrak(bytes, s, e, fragmented)
      }.flatten.toVector
      val tracks =
        if (!fragmented) base
        else {
          val frags = parseFragments(bytes, top, trexMap)
          base.map { t =>
            val mine = frags.getOrElse(t.trackId, Vector.empty)
            val reIdx = mine.zipWithIndex.map { case (fs, i) =>
              Sample(t.samples.length + i + 1, fs.offset, fs.size, fs.sync)
            }
            t.copy(samples = t.samples ++ reIdx,
              duration = t.duration + mine.map(_.duration).sum,
              fragmented = true)
          }.filter(_.samples.nonEmpty)
        }
      if (tracks.isEmpty) None
      else {
        val movieDur =
          if (mvDur != 0L || !fragmented) mvDur
          else tracks.map(t =>
            if (t.timescale == 0) 0L
            else t.duration * mvTs / t.timescale).max
        Some(Meta(brand, mvTs, movieDur, tracks))
      }
    } catch { case _: Exception => None }

  /** A fragment-run sample before final renumbering: window + sync +
    * its declared duration (media timescale).
    */
  private final case class FragSample(index: Int, offset: Long, size: Long,
      sync: Boolean, duration: Long)

  /** Walk every top-level moof and expand its traf/trun runs into
    * absolute sample windows, per track. Runs that cannot be bounded
    * (hostile counts) or positioned (missing base offset conventions)
    * drop their traf — the track then fails closed in the caller if it
    * ends up sampleless.
    */
  private def parseFragments(b: Array[Byte],
      top: Vector[(String, Int, Int, Int)],
      trex: Map[Long, (Long, Long, Long)]): Map[Long, Vector[FragSample]] = {
    val acc = scala.collection.mutable.Map.empty[Long, Vector[FragSample]]
      .withDefaultValue(Vector.empty)
    for ((typ, ms, me, hl) <- top if typ == "moof") {
      val moofStart = (ms - hl).toLong // exact: compact (8) or largesize (16)
      for ((ttyp, ts, te) <- boxes(b, ms, me) if ttyp == "traf") {
        parseTraf(b, ts, te, moofStart, trex).foreach {
          case (tid, samples) => acc(tid) = acc(tid) ++ samples
        }
      }
    }
    acc.view.mapValues(v =>
      v.zipWithIndex.map { case (fs, i) => fs.copy(index = i + 1) }).toMap
  }

  private def parseTraf(b: Array[Byte], ts: Int, te: Int, moofStart: Long,
      trex: Map[Long, (Long, Long, Long)]): Option[(Long, Vector[FragSample])] = {
    val (hs, _) = findBox(b, ts, te, "tfhd").getOrElse(return None)
    val tfFlags = u32(b, hs) & 0xffffffL
    val trackId = u32(b, hs + 4)
    var pos = hs + 8
    val baseOff: Option[Long] =
      if ((tfFlags & 0x1L) != 0) { val v = u64(b, pos); pos += 8; Some(v) }
      else None
    if ((tfFlags & 0x2L) != 0) pos += 4 // sample_description_index
    val (trexDur, trexSize, trexFlags) =
      trex.getOrElse(trackId, (0L, 0L, 0x10000L))
    val defDur =
      if ((tfFlags & 0x8L) != 0) { val v = u32(b, pos); pos += 4; v }
      else trexDur
    val defSize =
      if ((tfFlags & 0x10L) != 0) { val v = u32(b, pos); pos += 4; v }
      else trexSize
    val defFlags =
      if ((tfFlags & 0x20L) != 0) { val v = u32(b, pos); pos += 4; v }
      else trexFlags
    // base: explicit > moof start (default-base-is-moof AND the
    // first-traf convention — both resolve to the enclosing moof)
    val base = baseOff.getOrElse(moofStart)
    val out = Vector.newBuilder[FragSample]
    // cursor advances across this traf's truns; a trun without its own
    // data offset continues where the previous one ended
    var cursor = -1L
    var idx = 0
    for ((typ, x, xe) <- boxes(b, ts, te) if typ == "trun") {
      val flags = u32(b, x) & 0xffffffL
      val n = u32(b, x + 4)
      var p = x + 8
      if ((flags & 0x1L) != 0) {
        cursor = base + u32(b, p).toInt // data_offset is SIGNED 32-bit
        p += 4
      } else if (cursor < 0) cursor = base
      val firstFlags: Option[Long] =
        if ((flags & 0x4L) != 0) { val v = u32(b, p); p += 4; Some(v) }
        else None
      val perSample = Seq(0x100L, 0x200L, 0x400L, 0x800L)
        .count(f => (flags & f) != 0) * 4
      // hostile-count bound BEFORE the loop (same contract as stsz):
      // with per-sample fields the box extent bounds n; without, the
      // run's samples all have the default size, so the file itself
      // bounds n at length/defSize — a boxed FragSample costs far more
      // than a payload byte, so bytes.length alone would still let a
      // crafted count amplify memory 20-80x
      val room = if (perSample > 0) (xe - p).toLong / perSample
        else math.min(b.length.toLong / math.max(1L, defSize),
          MaxSamples.toLong)
      if (n < 0L || n > room) return None
      var i = 0
      while (i < n.toInt) {
        var dur = defDur
        var size = defSize
        var sf = if (i == 0) firstFlags.getOrElse(defFlags) else defFlags
        if ((flags & 0x100L) != 0) { dur = u32(b, p); p += 4 }
        if ((flags & 0x200L) != 0) { size = u32(b, p); p += 4 }
        if ((flags & 0x400L) != 0) { sf = u32(b, p); p += 4 }
        if ((flags & 0x800L) != 0) p += 4 // composition time offset
        idx += 1
        out += FragSample(idx, cursor, size, (sf & 0x10000L) == 0L, dur)
        cursor += size
        i += 1
      }
    }
    val samples = out.result()
    if (samples.isEmpty) None else Some((trackId, samples))
  }

  private def parseTrak(b: Array[Byte], s: Int, e: Int,
      allowEmptySamples: Boolean = false): Option[Track] = {
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
    // track_ID sits after the (versioned) creation/modification stamps
    val trackId = b(tkS) match {
      case 1 => u32(b, tkS + 20)
      case _ => u32(b, tkS + 12)
    }
    // edit list: the first non-empty edit's media_time (see Track doc).
    // v0 entries are 12 bytes (u32 dur, s32 media_time, 16.16 rate),
    // v1 are 20 (u64/s64); -1 media_time = empty edit, skipped.
    val mediaTimeOffset = findBox(b, s, e, "edts").flatMap {
      case (es, ee) =>
        findBox(b, es, ee, "elst").flatMap { case (xs, xe) =>
          val v1 = b(xs) == 1
          val entry = if (v1) 20 else 12
          val n = u32(b, xs + 4)
          if (n < 0L || n > (xe - xs - 8).toLong / entry) None
          else (0 until n.toInt).iterator.map { i =>
            val off = xs + 8 + i * entry
            if (v1) u64(b, off + 8)
            else u32(b, off + 4).toInt.toLong // sign-extend s32
          }.find(_ >= 0L)
        }
    }.getOrElse(0L)
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
    val (stsdS, stsdE) = findBox(b, stS, stE, "stsd")
      .filter { case (x, y) => y - x >= 16 }.getOrElse(return None)
    val codec = tag(b, stsdS + 12)
    // AudioSampleEntry (14496-12 §12.2.3): after the 8-byte entry box
    // header and the 8-byte SampleEntry base, 8 reserved bytes, then
    // channelcount(2) samplesize(2) pre_defined(2) reserved(2)
    // samplerate(16.16) — present only for soun handlers
    val (channels, sampleRate) =
      if (handler == "soun" && stsdE - stsdS >= 44)
        (u16(b, stsdS + 32), u32(b, stsdS + 40) >> 16)
      else (0, 0L)
    samples(b, stS, stE, allowEmptySamples).map(sm =>
      Track(handler, codec, width, height, ts, dur, sm,
        trackId = trackId, mediaTimeOffset = mediaTimeOffset,
        channels = channels, sampleRate = sampleRate))
  }

  /** Expand the four sample tables into absolute per-sample windows.
    * stsc runs give samples-per-chunk; stco/co64 give chunk starts; a
    * sample's offset is its chunk start plus the sizes of the samples
    * before it IN THAT CHUNK (14496-12 §8.7.4-8.7.5).
    */
  private def samples(b: Array[Byte], s: Int, e: Int,
      allowEmpty: Boolean = false): Option[Vector[Sample]] = {
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
        // nothing — cap against the file itself DIVIDED by the uniform
        // size (n uniform-sized samples need n*uniform payload bytes;
        // bytes.length alone would let uniform=1 allocate one boxed
        // Long per payload byte, a 20-80x memory amplification)
        if (n < 0L || n > math.min(b.length / uniform, MaxSamples.toLong))
          return None
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
    // fragmented layouts declare zero-entry sample tables in moov and
    // carry every sample in moof runs — an empty stbl is then valid
    if (allowEmpty && sizes.isEmpty) return Some(Vector.empty)
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
      includeStss: Boolean = true, // false: omit stss (= all sync)
      audio: Boolean = false,      // soun track (m4a): mp4a entry + smhd
      channels: Int = 2)           // audio sample entry only

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
    val hdlr = box("hdlr", vf0, be32(0),
      fourcc(if (spec.audio) "soun" else "vide"),
      new Array[Byte](12), Array[Byte](0))

    val sampleEntry =
      if (spec.audio)
        // AudioSampleEntry: 6 reserved + dri(2), 8 reserved,
        // channelcount(2), samplesize(2), pre_defined(2), reserved(2),
        // samplerate 16.16 (= the media timescale, the m4a convention)
        box("mp4a", new Array[Byte](6), be16(1),
          new Array[Byte](8), be16(spec.channels), be16(16),
          be16(0), be16(0), be32(spec.timescale << 16))
      else
        box("mp4v", new Array[Byte](6), be16(1),
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
    val mediaHeader =
      if (spec.audio) box("smhd", vf0, be16(0), be16(0))
      else box("vmhd", Array[Byte](0, 0, 0, 1),
        be16(0), be16(0), be16(0), be16(0))
    val dinf = box("dinf", box("dref", vf0, be32(1),
      box("url ", Array[Byte](0, 0, 0, 1))))
    val minf = box("minf", mediaHeader, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  // ------------------------------------------------------------------
  // Fragmented muxer (fMP4 — the moov/mvex + moof/mdat layout)
  // ------------------------------------------------------------------

  /** Spec of a single-video-track FRAGMENTED file: `fragmentSizes(f)`
    * is fragment f's per-sample byte sizes; sample numbering (for
    * `fill` and `syncEvery`) is GLOBAL 1-based across fragments, same
    * contract as [[BuildSpec]]. `explicitBaseOffset` writes tfhd's
    * 64-bit base_data_offset (absolute file position of the moof)
    * instead of the default-base-is-moof flag — the two conventions
    * the parser must treat identically. `trunsPerFragment` splits each
    * fragment's run into that many trun boxes; only the first carries
    * a data offset, so the parser's continue-from-previous-trun cursor
    * is exercised. `elstMediaTime` >= 0 adds an edit list with that
    * media_time (surfaced as [[Track.mediaTimeOffset]]).
    *
    * Flag encoding is chosen per fragment: when every keyframe in the
    * fragment sits at a trun's first sample, the muxer uses
    * first-sample-flags + tfhd default flags (the compact form real
    * encoders emit for closed GOPs); otherwise per-sample trun flags.
    * Durations always ride tfhd's default_sample_duration (trex holds
    * the same value as fallback), so the defaults chain is on the hot
    * path, not just per-sample fields.
    */
  final case class FragBuildSpec(
      width: Int, height: Int,
      fragmentSizes: Seq[Seq[Int]],
      syncEvery: Int,
      timescale: Long = 1000L,
      sampleDelta: Long = 40L,
      fill: Int => Byte = i => (i % 251).toByte,
      explicitBaseOffset: Boolean = false,
      trunsPerFragment: Int = 1,
      elstMediaTime: Long = -1L)

  private val NonSyncFlags = 0x00010000L // sample_is_non_sync_sample
  private val SyncFlags = 0x02000000L    // sample_depends_on = 2 (I-frame)

  /** Serialize a valid fragmented single-track MP4 per `spec`: ftyp,
    * moov (zero-entry sample tables + mvex/trex), then one moof+mdat
    * pair per fragment.
    */
  def writeFragmented(spec: FragBuildSpec): Array[Byte] = {
    require(spec.fragmentSizes.nonEmpty && spec.fragmentSizes.forall(_.nonEmpty),
      "at least one fragment, none empty")
    require(spec.trunsPerFragment >= 1, "trunsPerFragment must be >= 1")
    val ftyp = box("ftyp", fourcc("iso5"), be32(0), fourcc("iso5"),
      fourcc("isom"))
    val n = spec.fragmentSizes.map(_.size).sum
    val duration = spec.sampleDelta * n
    val vf0 = be32(0)
    val identityMatrix = be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)
    // movie-level durations are 0 in fragmented files: the moov is
    // written before any fragment exists; readers derive duration
    val mvhd = box("mvhd", vf0, be32(0) ++ be32(0), be32(spec.timescale),
      be32(0), be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0),
      identityMatrix, new Array[Byte](24), be32(2))
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7),
      be32(0) ++ be32(0), be32(1), be32(0), be32(0),
      be32(0) ++ be32(0), be16(0), be16(0), be16(0), be16(0),
      identityMatrix,
      be32(spec.width.toLong << 16), be32(spec.height.toLong << 16))
    val edts =
      if (spec.elstMediaTime < 0) Array.emptyByteArray
      else box("edts", box("elst", vf0, be32(1),
        be32(duration), be32(spec.elstMediaTime), be16(1), be16(0)))
    val mdhd = box("mdhd", vf0, be32(0) ++ be32(0), be32(spec.timescale),
      be32(0), be16(0x55c4), be16(0))
    val hdlr = box("hdlr", vf0, be32(0), fourcc("vide"),
      new Array[Byte](12), Array[Byte](0))
    val sampleEntry = box("mp4v", new Array[Byte](6), be16(1),
      new Array[Byte](16), be16(spec.width), be16(spec.height),
      be32(0x00480000L), be32(0x00480000L), be32(0), be16(1),
      new Array[Byte](32), be16(24), be16(0xffff))
    val stbl = box("stbl",
      box("stsd", vf0, be32(1), sampleEntry),
      box("stts", vf0, be32(0)),
      box("stsz", vf0, be32(0), be32(0)),
      box("stsc", vf0, be32(0)),
      box("stco", vf0, be32(0)))
    val vmhd = box("vmhd", Array[Byte](0, 0, 0, 1),
      be16(0), be16(0), be16(0), be16(0))
    val dinf = box("dinf", box("dref", vf0, be32(1),
      box("url ", Array[Byte](0, 0, 0, 1))))
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd +: (if (edts.isEmpty) Seq(mdia)
      else Seq(edts, mdia)): _*)
    val trex = box("trex", vf0, be32(1), be32(1),
      be32(spec.sampleDelta), be32(0), be32(NonSyncFlags))
    val moov = box("moov", mvhd, trak, box("mvex", trex))

    val out = new scala.collection.mutable.ArrayBuffer[Byte](
      ftyp.length + moov.length)
    out ++= ftyp
    out ++= moov
    var globalIdx = 0
    def isSync(g: Int): Boolean = (g - 1) % spec.syncEvery == 0
    for ((sizes, fi) <- spec.fragmentSizes.zipWithIndex) {
      val gBase = globalIdx
      // split into truns (first gets the data offset; later ones ride
      // the parser's continuation cursor)
      val per = math.max(1, math.ceil(sizes.size.toDouble /
        spec.trunsPerFragment).toInt)
      val runs = sizes.grouped(per).toVector
      // compact flag form iff every sync sample heads a trun
      val compactOk = (1 to sizes.size).forall { li =>
        !isSync(gBase + li) || (li - 1) % per == 0
      }
      def trunBytes(runIdx: Int, run: Seq[Int], runGBase: Int,
          dataOffset: Long): Array[Byte] = {
        val withOffset = runIdx == 0
        val flags =
          (if (withOffset) 0x1L else 0L) |
            0x200L |
            (if (compactOk) (if (isSync(runGBase + 1)) 0x4L else 0L)
             else 0x400L)
        val head = Array[Byte](0, ((flags >> 16) & 0xff).toByte,
          ((flags >> 8) & 0xff).toByte, (flags & 0xff).toByte)
        val offField = if (withOffset) be32(dataOffset) else Array.emptyByteArray
        val fsf = if (compactOk && isSync(runGBase + 1))
          be32(SyncFlags) else Array.emptyByteArray
        val body = run.zipWithIndex.flatMap { case (sz, li) =>
          val g = runGBase + li + 1
          be32(sz.toLong) ++ (if (compactOk) Array.emptyByteArray
            else be32(if (isSync(g)) SyncFlags else NonSyncFlags))
        }.toArray
        box("trun", head, be32(run.size.toLong), offField, fsf, body)
      }
      def moofBytes(dataOffset: Long, baseDataOffset: Option[Long]): Array[Byte] = {
        val tfFlags = 0x8L | 0x20L |
          (if (baseDataOffset.isDefined) 0x1L else 0x20000L)
        val tfhd = box("tfhd",
          Array[Byte](0, ((tfFlags >> 16) & 0xff).toByte,
            ((tfFlags >> 8) & 0xff).toByte, (tfFlags & 0xff).toByte),
          be32(1),
          baseDataOffset.map(be64).getOrElse(Array.emptyByteArray),
          be32(spec.sampleDelta), be32(NonSyncFlags))
        val tfdt = box("tfdt", vf0, be32(gBase.toLong * spec.sampleDelta))
        var runG = gBase
        val truns = runs.zipWithIndex.map { case (run, ri) =>
          val t = trunBytes(ri, run, runG, dataOffset)
          runG += run.size
          t
        }
        box("moof", box("mfhd", vf0, be32(fi + 1L)),
          box("traf", tfhd +: tfdt +: truns: _*))
      }
      // two-pass: the data offset depends on the moof's own size, and
      // every field is fixed-width, so a placeholder pass sizes it
      val moofStart = out.length.toLong
      val probe = moofBytes(0L, if (spec.explicitBaseOffset) Some(0L) else None)
      val dataOffset = probe.length + 8L // moof, then mdat header
      val moof = moofBytes(dataOffset,
        if (spec.explicitBaseOffset) Some(moofStart) else None)
      require(moof.length == probe.length, "placeholder pass drifted")
      val payload = new Array[Byte](sizes.sum)
      var off = 0
      for (li <- 1 to sizes.size) {
        val g = gBase + li
        java.util.Arrays.fill(payload, off, off + sizes(li - 1), spec.fill(g))
        off += sizes(li - 1)
      }
      out ++= moof
      out ++= box("mdat", payload)
      globalIdx += sizes.size
    }
    out.toArray
  }
}
