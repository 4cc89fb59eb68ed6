package graft.ext

/** AVI (RIFF) container parsing — pure bytes, no codec.
  *
  * AVI is the PUBLIC Microsoft RIFF video format (the `.avi` entry of
  * the reference's video extension set,
  * /root/reference/cc2dataset/main.py:23-27; the reference ships only
  * LINKS — parsing is beyond-reference, completing the video container
  * trio with [[Mp4]] and [[Webm]]). The walk covers:
  *
  *  - `RIFF('AVI ')` → `LIST('hdrl')` → `avih` (frame interval µs,
  *    total frames, width/height) and the first `LIST('strl')` whose
  *    `strh` declares `vids` (codec fourcc, scale/rate);
  *  - `LIST('movi')` → `##dc`/`##db` chunks of the video stream: each
  *    is one frame at an exact byte window;
  *  - `idx1` (when present): the AVIIF_KEYFRAME flag (0x10) per chunk,
  *    matched positionally to the movi walk. Without an index every
  *    frame counts as a keyframe (the WAV-era convention for
  *    uncompressed `##db` streams).
  *
  * RIFF is length-delimited like EBML — no count-prefixed allocation;
  * malformed lengths end the walk and fail closed to None.
  * [[write]] is the muxer twin for closed-form fixtures.
  */
object Avi {

  final case class Frame(index: Int, offset: Long, size: Long,
      keyframe: Boolean)

  final case class Meta(
      codec: String, width: Int, height: Int,
      usPerFrame: Long, totalFrames: Long, frames: Vector[Frame]) {
    def durationMs: Long = totalFrames * usPerFrame / 1000L
    def keyframeCount: Int = frames.count(_.keyframe)
  }

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI "

  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** RIFF sub-chunks of [start, end): (ckid, payloadStart, payloadEnd).
    * For LIST chunks the ckid is the LIST TYPE and the payload starts
    * after it. Chunks are 2-byte aligned; bad lengths end iteration.
    */
  private def chunks(b: Array[Byte], start: Int,
      end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var pos = start
      def hasNext: Boolean = pos + 8 <= end
      def next(): (String, Int, Int) = {
        val id = tag(b, pos)
        val sz = leU32(b, pos + 4)
        val ps = pos + 8
        val pe = ps + sz
        if (sz < 0 || pe > end || pe < ps) {
          pos = end
          ("", end, end)
        } else {
          pos = (pe + (sz & 1L)).toInt // 2-byte alignment
          if (id == "LIST" && pe - ps >= 4) (tag(b, ps), ps + 4, pe.toInt)
          else (id, ps, pe.toInt)
        }
      }
    }

  private def findChunk(b: Array[Byte], s: Int, e: Int,
      id: String): Option[(Int, Int)] =
    chunks(b, s, e).collectFirst { case (`id`, x, y) => (x, y) }

  /** Parse the container. None unless a well-formed AVI with an avih
    * header, a vids stream, and at least one video frame chunk.
    */
  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      if (!isAvi(bytes)) return None
      val end = math.min(bytes.length.toLong, 8L + leU32(bytes, 4)).toInt
      val (hdrlS, hdrlE) = findChunk(bytes, 12, end, "hdrl")
        .getOrElse(return None)
      val (avihS, avihE) = findChunk(bytes, hdrlS, hdrlE, "avih")
        .getOrElse(return None)
      if (avihE - avihS < 40) return None
      val usPerFrame = leU32(bytes, avihS)
      val totalFrames = leU32(bytes, avihS + 16)
      val width = leU32(bytes, avihS + 32).toInt
      val height = leU32(bytes, avihS + 36).toInt
      // first strl whose strh is a vids stream; its ORDER among strls
      // is the stream number encoded in movi chunk ids ("0Xdc")
      var vidsStream = -1
      var codec = ""
      var strlIdx = 0
      for ((id, s, e) <- chunks(bytes, hdrlS, hdrlE) if id == "strl") {
        findChunk(bytes, s, e, "strh").foreach { case (hs, he) =>
          if (he - hs >= 8 && tag(bytes, hs) == "vids" && vidsStream < 0) {
            vidsStream = strlIdx
            codec = tag(bytes, hs + 4)
          }
        }
        strlIdx += 1
      }
      if (vidsStream < 0) return None
      val streamTag = f"$vidsStream%02d"
      val (moviS, moviE) = findChunk(bytes, 12, end, "movi")
        .getOrElse(return None)
      val windows = Vector.newBuilder[(Long, Long)]
      for ((id, s, e) <- chunks(bytes, moviS, moviE)
           if id.length == 4 && id.startsWith(streamTag) &&
             (id.endsWith("dc") || id.endsWith("db")))
        windows += ((s.toLong, (e - s).toLong))
      val ws = windows.result()
      if (ws.isEmpty) return None
      // idx1: positional keyframe flags for this stream's chunks
      val keyFlags: Option[Vector[Boolean]] =
        findChunk(bytes, 12, end, "idx1").map { case (s, e) =>
          val out = Vector.newBuilder[Boolean]
          var pos = s
          while (pos + 16 <= e) {
            val ckid = tag(bytes, pos)
            if (ckid.startsWith(streamTag) &&
              (ckid.endsWith("dc") || ckid.endsWith("db")))
              out += ((leU32(bytes, pos + 4) & 0x10L) != 0L)
            pos += 16
          }
          out.result()
        }.filter(_.length == ws.length)
      val frames = ws.zipWithIndex.map { case ((off, sz), i) =>
        Frame(i + 1, off, sz, keyFlags.map(_(i)).getOrElse(true))
      }
      Some(Meta(codec, width, height, usPerFrame, totalFrames, frames))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // Minimal muxer (the inverse, for closed-form fixtures)
  // ------------------------------------------------------------------

  /** Spec of a single-vids-stream AVI: `fill(i)` fills 1-based frame
    * i's chunk; `keyEvery` marks frames 1, 1+k, ... as keyframes in
    * idx1 (`withIndex = false` omits idx1 → all frames sync).
    */
  final case class BuildSpec(
      width: Int, height: Int,
      frameSizes: Seq[Int],
      keyEvery: Int,
      usPerFrame: Long = 40000L, // 25 fps
      codec: String = "MJPG",
      fill: Int => Byte = i => (i % 251).toByte,
      withIndex: Boolean = true)

  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  private def chunk(id: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte
      else payload
    fourcc(id) ++ le32(payload.length.toLong) ++ padded
  }

  private def list(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val payload = fourcc(typ) ++
      parts.foldLeft(Array.emptyByteArray)(_ ++ _)
    fourcc("LIST") ++ le32(payload.length.toLong) ++ payload
  }

  def write(spec: BuildSpec): Array[Byte] = {
    val n = spec.frameSizes.length
    require(n > 0 && spec.keyEvery >= 1)
    val avih = chunk("avih", le32(spec.usPerFrame),
      le32(0), le32(0), le32(0x10), // AVIF_HASINDEX
      le32(n.toLong), le32(0), le32(1), le32(0),
      le32(spec.width.toLong), le32(spec.height.toLong),
      new Array[Byte](16))
    val strh = chunk("strh", fourcc("vids"), fourcc(spec.codec),
      le32(0), le32(0), le32(0),
      le32(1), le32(1000000L / spec.usPerFrame), // scale, rate
      le32(0), le32(n.toLong), le32(0), le32(0), le32(0),
      new Array[Byte](8))
    // BITMAPINFOHEADER stand-in (strf is required by readers)
    val strf = chunk("strf", le32(40), le32(spec.width.toLong),
      le32(spec.height.toLong), Array[Byte](1, 0, 24, 0),
      fourcc(spec.codec), le32(0), le32(0), le32(0), le32(0), le32(0))
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val frameChunks = (1 to n).map { i =>
      chunk("00dc", Array.fill(spec.frameSizes(i - 1))(spec.fill(i)))
    }
    val movi = list("movi", frameChunks: _*)
    // idx1 offsets are relative to the movi LIST type fourcc start
    val idx1 =
      if (!spec.withIndex) Array.emptyByteArray
      else {
        var rel = 4L // past the "movi" type tag
        chunk("idx1", (1 to n).flatMap { i =>
          val e = fourcc("00dc") ++
            le32(if ((i - 1) % spec.keyEvery == 0) 0x10L else 0L) ++
            le32(rel) ++ le32(spec.frameSizes(i - 1).toLong)
          rel += 8L + spec.frameSizes(i - 1) + (spec.frameSizes(i - 1) & 1)
          e
        }.toArray)
      }
    val riffPayload = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    fourcc("RIFF") ++ le32(riffPayload.length.toLong) ++ riffPayload
  }
}
