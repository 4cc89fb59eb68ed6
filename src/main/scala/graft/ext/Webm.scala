package graft.ext

/** WebM/Matroska (EBML) container parsing — pure bytes, no codec.
  *
  * EBML is the PUBLIC Matroska grammar (RFC 8794 + the Matroska/WebM
  * element registry): every element is (vint id, vint size, payload),
  * recursively. Walking EBML header → Segment → Info / Tracks /
  * Clusters recovers what frame sampling needs short of decoding
  * pixels: the video track's dimensions and codec id, the timecode
  * scale and duration, the keyframe flag, and the EXACT byte window of
  * every SimpleBlock's frame payload. Together with [[Mp4]] this
  * covers the back half of the reference's video extension list
  * (/root/reference/cc2dataset/main.py:23-27 — webm sits in its video
  * link suffixes); the reference itself ships only LINKS, so real
  * container parsing is a beyond-reference capability.
  *
  * [[write]] is the inverse: a minimal muxer producing a valid
  * single-video-track WebM from a spec, so fixtures and queries can
  * build deterministic files whose parsed metadata is a closed-form
  * function of the spec (DuckDB-expressible), while still writing
  * honest elements a third-party demuxer would accept.
  *
  * Hostile-input contract (same as [[Mp4]]): parse never throws and
  * never allocates from attacker-controlled counts — EBML has no
  * count-prefixed tables (it is length-delimited), so the walk is
  * bounded by the payload extents themselves; malformed extents end
  * the walk and whatever is then missing fails closed to None.
  */
object Webm {

  /** One SimpleBlock: 1-based index among the file's blocks, owning
    * track, absolute frame-payload byte window, keyframe flag, and the
    * cluster-relative timecode (timecode-scale units).
    */
  final case class Block(index: Int, trackNum: Long, offset: Long,
      size: Long, keyframe: Boolean, timecode: Long)

  final case class VideoTrack(trackNum: Long, codec: String,
      width: Int, height: Int)

  final case class Meta(
      docType: String, timecodeScaleNs: Long, durationTc: Double,
      videoTrack: Option[VideoTrack], blocks: Vector[Block]) {
    /** Duration in milliseconds: Duration (timecode units) × scale. */
    def durationMs: Long =
      math.round(durationTc * timecodeScaleNs / 1e6)
    def videoBlocks: Vector[Block] = videoTrack match {
      case Some(t) => blocks.filter(_.trackNum == t.trackNum)
      case None => Vector.empty
    }
  }

  /** Cheap sniff: the EBML header element id in the first slot. */
  def isWebm(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0x1a && (bytes(1) & 0xff) == 0x45 &&
      (bytes(2) & 0xff) == 0xdf && (bytes(3) & 0xff) == 0xa3

  // --- element ids (marker bits retained, per EBML convention) ---
  private val IdEbml = 0x1a45dfa3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimecodeScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdTrackNumber = 0xd7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL
  private val IdCluster = 0x1f43b675L
  private val IdTimecode = 0xe7L
  private val IdSimpleBlock = 0xa3L

  /** vint length from the leading byte: position of the highest set
    * bit. 0 for a zero byte (malformed — no marker within 8 bytes).
    */
  private def vintLen(b0: Int): Int = {
    var l = 1
    var mask = 0x80
    while (mask != 0) {
      if ((b0 & mask) != 0) return l
      l += 1
      mask >>= 1
    }
    0
  }

  /** (value, bytesRead) of the vint at `i` with the marker STRIPPED —
    * the size encoding. (-1, 0) when malformed/out of bounds;
    * (-2, len) for the reserved all-ones "unknown size".
    */
  private def readVintSize(b: Array[Byte], i: Int): (Long, Int) = {
    if (i >= b.length) return (-1L, 0)
    val l = vintLen(b(i) & 0xff)
    if (l == 0 || i + l > b.length) return (-1L, 0)
    var v = ((b(i) & 0xff) & (0xff >>> l)).toLong
    var allOnes = ((b(i) & 0xff) | (~(0xff >>> l) & 0xff)) == 0xff
    var k = 1
    while (k < l) {
      val byte = b(i + k) & 0xff
      v = (v << 8) | byte
      allOnes &&= byte == 0xff
      k += 1
    }
    if (allOnes) (-2L, l) else (v, l)
  }

  /** (id, bytesRead) of the element id at `i`, marker RETAINED. */
  private def readId(b: Array[Byte], i: Int): (Long, Int) = {
    if (i >= b.length) return (-1L, 0)
    val l = vintLen(b(i) & 0xff)
    if (l == 0 || l > 4 || i + l > b.length) return (-1L, 0)
    var v = 0L
    var k = 0
    while (k < l) { v = (v << 8) | (b(i + k) & 0xff); k += 1 }
    (v, l)
  }

  /** Child elements of [start, end): (id, payloadStart, payloadEnd).
    * An element with the reserved unknown size extends to the parent's
    * end (the streaming-WebM convention for Segment/Cluster).
    * Malformed ids/sizes/extents end iteration — callers fail closed
    * on whatever is then missing.
    */
  private def children(b: Array[Byte], start: Int,
      end: Int): Iterator[(Long, Int, Int)] =
    new Iterator[(Long, Int, Int)] {
      private var pos = start
      private var dead = false
      def hasNext: Boolean = !dead && pos + 2 <= end
      def next(): (Long, Int, Int) = {
        val (id, idLen) = readId(b, pos)
        if (id < 0) { dead = true; return (-1L, end, end) }
        val (sz, szLen) = readVintSize(b, pos + idLen)
        if (szLen == 0) { dead = true; return (-1L, end, end) }
        val ps = pos + idLen + szLen
        val pe = if (sz == -2L) end else ps + sz
        if (ps > end || pe > end || pe < ps) {
          dead = true
          (-1L, end, end)
        } else {
          val out = (id, ps, pe.toInt)
          pos = pe.toInt
          out
        }
      }
    }

  private def uint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L
    var i = s
    while (i < e && i - s < 8) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  private def float(b: Array[Byte], s: Int, e: Int): Double = (e - s) match {
    case 4 => java.lang.Float.intBitsToFloat(uint(b, s, e).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uint(b, s, e))
    case _ => 0.0
  }

  private def str(b: Array[Byte], s: Int, e: Int): String =
    new String(b, s, e - s, "US-ASCII")

  /** Parse the container. None for anything that is not a well-formed
    * EBML file with a Segment — the honest signal for callers to fall
    * back. A file without a video track still parses (audio-only WebM
    * is valid); [[Meta.videoTrack]] is then None.
    */
  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isWebm(bytes)) return None
      var docType = "matroska"
      var segment: Option[(Int, Int)] = None
      for ((id, s, e) <- children(bytes, 0, bytes.length)) id match {
        case IdEbml =>
          children(bytes, s, e).foreach {
            case (IdDocType, ds, de) => docType = str(bytes, ds, de)
            case _ =>
          }
        case IdSegment if segment.isEmpty => segment = Some((s, e))
        case _ =>
      }
      val (segS, segE) = segment.getOrElse(return None)
      var tcScale = 1000000L // Matroska default: 1 ms
      var durationTc = 0.0
      var video: Option[VideoTrack] = None
      val blocks = Vector.newBuilder[Block]
      var blockIdx = 0
      for ((id, s, e) <- children(bytes, segS, segE)) id match {
        case IdInfo =>
          children(bytes, s, e).foreach {
            case (IdTimecodeScale, xs, xe) => tcScale = uint(bytes, xs, xe)
            case (IdDuration, xs, xe) => durationTc = float(bytes, xs, xe)
            case _ =>
          }
        case IdTracks =>
          for ((tid, ts, te) <- children(bytes, s, e)
               if tid == IdTrackEntry && video.isEmpty) {
            var num = 0L
            var typ = 0L
            var codec = ""
            var w = 0
            var h = 0
            children(bytes, ts, te).foreach {
              case (IdTrackNumber, xs, xe) => num = uint(bytes, xs, xe)
              case (IdTrackType, xs, xe) => typ = uint(bytes, xs, xe)
              case (IdCodecId, xs, xe) => codec = str(bytes, xs, xe)
              case (IdVideo, xs, xe) =>
                children(bytes, xs, xe).foreach {
                  case (IdPixelWidth, ps, pe) => w = uint(bytes, ps, pe).toInt
                  case (IdPixelHeight, ps, pe) => h = uint(bytes, ps, pe).toInt
                  case _ =>
                }
              case _ =>
            }
            if (typ == 1L && num > 0L) video = Some(VideoTrack(num, codec, w, h))
          }
        case IdCluster =>
          children(bytes, s, e).foreach {
            case (IdSimpleBlock, bs, be) =>
              // block payload: track vint, s16 relative timecode, u8
              // flags (0x80 = keyframe), then the frame bytes
              val (track, tl) = readVintSize(bytes, bs)
              if (track > 0 && bs + tl + 3 <= be) {
                val tc = ((bytes(bs + tl) & 0xff) << 8 |
                  (bytes(bs + tl + 1) & 0xff)).toShort.toLong
                val flags = bytes(bs + tl + 2) & 0xff
                blockIdx += 1
                blocks += Block(blockIdx, track, bs + tl + 3L,
                  be - (bs + tl + 3L), (flags & 0x80) != 0, tc)
              }
            case _ =>
          }
        case _ =>
      }
      Some(Meta(docType, tcScale, durationTc, video, blocks.result()))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // Minimal muxer (the inverse function, used by fixtures and queries)
  // ------------------------------------------------------------------

  /** Spec of a single-video-track WebM. `fill(i)` is the payload byte
    * of 1-based block i; `keyEvery` marks blocks 1, 1+k, ... as
    * keyframes. `unknownSizeSegment` writes the Segment with the
    * reserved all-ones size (the live-streaming form), exercising the
    * extend-to-end parse path.
    */
  final case class BuildSpec(
      width: Int, height: Int,
      blockSizes: Seq[Int],
      keyEvery: Int,
      blocksPerCluster: Int = 4,
      timecodeScaleNs: Long = 1000000L,
      blockDurationTc: Long = 40L,
      fill: Int => Byte = i => (i % 251).toByte,
      codec: String = "V_VP9",
      unknownSizeSegment: Boolean = false)

  /** 4-byte definite vint size (value < 2^28). */
  private def vintSize4(v: Long): Array[Byte] = {
    require(v >= 0 && v < (1L << 28), s"size out of 4-byte vint range: $v")
    Array((0x10 | ((v >> 24) & 0x0f)).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  }

  private def idBytes(id: Long): Array[Byte] = {
    val l = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
      else if (id <= 0xffffffL) 3 else 4
    (0 until l).map(k => ((id >> (8 * (l - 1 - k))) & 0xff).toByte).toArray
  }

  private def elem(id: Long, parts: Array[Byte]*): Array[Byte] = {
    val payload = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
    idBytes(id) ++ vintSize4(payload.length.toLong) ++ payload
  }

  private def uintBytes(v: Long): Array[Byte] = {
    var l = 1
    while (l < 8 && (v >>> (8 * l)) != 0) l += 1
    (0 until l).map(k => ((v >> (8 * (l - 1 - k))) & 0xff).toByte).toArray
  }

  private def uintElem(id: Long, v: Long): Array[Byte] =
    elem(id, uintBytes(v))

  /** Serialize a valid single-video-track WebM per `spec`: EBML header
    * (DocType webm), Segment(Info, Tracks, Clusters of SimpleBlocks —
    * `blocksPerCluster` per cluster, cluster timecodes advancing by
    * block duration).
    */
  def write(spec: BuildSpec): Array[Byte] = {
    val n = spec.blockSizes.length
    require(n > 0, "at least one block")
    require(spec.keyEvery >= 1 && spec.blocksPerCluster >= 1)
    val header = elem(IdEbml,
      uintElem(0x4286L, 1), // EBMLVersion
      uintElem(0x42f7L, 1), // EBMLReadVersion
      uintElem(0x42f2L, 4), // EBMLMaxIDLength
      uintElem(0x42f3L, 8), // EBMLMaxSizeLength
      elem(IdDocType, "webm".getBytes("US-ASCII")),
      uintElem(0x4287L, 2), // DocTypeVersion
      uintElem(0x4285L, 2)) // DocTypeReadVersion
    val durationTc = (n.toLong * spec.blockDurationTc).toDouble
    val info = elem(IdInfo,
      uintElem(IdTimecodeScale, spec.timecodeScaleNs),
      elem(IdDuration, {
        val bits = java.lang.Double.doubleToLongBits(durationTc)
        (0 until 8).map(k => ((bits >> (8 * (7 - k))) & 0xff).toByte).toArray
      }))
    val tracks = elem(IdTracks, elem(IdTrackEntry,
      uintElem(IdTrackNumber, 1),
      uintElem(0x73c5L, 1), // TrackUID
      uintElem(IdTrackType, 1), // video
      elem(IdCodecId, spec.codec.getBytes("US-ASCII")),
      elem(IdVideo,
        uintElem(IdPixelWidth, spec.width.toLong),
        uintElem(IdPixelHeight, spec.height.toLong))))
    val clusters = spec.blockSizes.zipWithIndex
      .grouped(spec.blocksPerCluster).zipWithIndex.map {
        case (group, ci) =>
          val clusterTc = group.head._2.toLong * spec.blockDurationTc
          val blocks = group.map { case (sz, i0) =>
            val i = i0 + 1 // 1-based global block index
            val frame = Array.fill(sz)(spec.fill(i))
            val relTc = (i0.toLong * spec.blockDurationTc - clusterTc).toShort
            val flags: Byte =
              if ((i - 1) % spec.keyEvery == 0) 0x80.toByte else 0x00
            elem(IdSimpleBlock,
              Array(0x81.toByte, // track 1 as 1-byte vint
                ((relTc >> 8) & 0xff).toByte, (relTc & 0xff).toByte, flags),
              frame)
          }
          elem(IdCluster,
            (uintElem(IdTimecode, clusterTc) +: blocks): _*)
      }.toVector
    val segPayload = (info +: tracks +: clusters)
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    val segment =
      if (spec.unknownSizeSegment)
        // reserved all-ones 4-byte size: extends to end of file
        idBytes(IdSegment) ++ Array(0x1f.toByte, 0xff.toByte, 0xff.toByte,
          0xff.toByte) ++ segPayload
      else idBytes(IdSegment) ++ vintSize4(segPayload.length.toLong) ++
        segPayload
    header ++ segment
  }
}
