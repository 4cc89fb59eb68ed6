package graft.ext

/** Audio container/header parsing — pure bytes, no codec, covering the
  * PUBLIC formats in the reference's audio extension set
  * (/root/reference/cc2dataset/main.py:70-72: mp3, wav, ogg, flac,
  * m4a... — the reference ships only LINKS; parsing the headers is a
  * beyond-reference capability, the audio twin of [[Mp4]]/[[Webm]]):
  *
  *  - MP3: MPEG-1 Layer III frame headers (ISO 11172-3) — sync walk
  *    over frames, bitrate/sample-rate tables, frame-length formula
  *    144 * bitrate / rate + padding, 1152 samples per frame;
  *  - FLAC: the STREAMINFO metadata block (bit-packed sample rate,
  *    channels, bits per sample, total samples);
  *  - OGG: page walk (capture pattern, segment lacing table) with the
  *    first-page id header dispatched to Vorbis (\x01vorbis) or Opus
  *    (OpusHead), duration from the final page's granule position
  *    (PCM samples for Vorbis; 48 kHz ticks minus pre-skip for Opus);
  *  - WAV rides the existing RIFF parser ([[Multimodal.decodeWav]]).
  *
  * Each muxer writes honest minimal files (real sync words, real bit
  * packing, real OGG page CRCs) whose parsed metadata is a closed-form
  * function of the spec — DuckDB-oracle-expressible, same pattern as
  * the video fixtures. Hostile input fails closed to None; nothing
  * allocates from attacker-controlled counts (frame/page walks are
  * extent-bounded).
  */
object Audio {

  /** Unified audio metadata row: `units` is the format's natural count
    * (MP3 frames, FLAC/WAV total samples per channel, OGG pages).
    */
  final case class Info(format: String, codec: String, sampleRate: Long,
      channels: Long, durationMs: Long, units: Long)

  /** Parse any supported format (sniff order: container magics are
    * disjoint, so order is cosmetic; MP3 last — its 11-bit sync is the
    * weakest magic).
    */
  def parse(bytes: Array[Byte]): Option[Info] =
    parseWav(bytes).orElse(parseFlac(bytes)).orElse(parseOgg(bytes))
      .orElse(parseM4a(bytes)).orElse(parseMp3(bytes))

  /** M4A = ISO-BMFF with a soun track: ride [[Mp4.parse]] (the same
    * box walk that serves video) and read channels + sample rate from
    * the stsd AudioSampleEntry; duration from the media timescale,
    * units = the sample (audio frame) count.
    */
  def parseM4a(bytes: Array[Byte]): Option[Info] =
    Mp4.parse(bytes).flatMap(_.tracks.find(_.handler == "soun")).collect {
      case t if t.timescale > 0 =>
        Info("m4a", t.codec,
          if (t.sampleRate > 0) t.sampleRate else t.timescale,
          t.channels.toLong,
          t.duration * 1000L / t.timescale, t.sampleCount.toLong)
    }

  // ------------------------------------------------------------------
  // WAV (RIFF) — delegate to the existing pure-byte parser
  // ------------------------------------------------------------------

  def parseWav(bytes: Array[Byte]): Option[Info] =
    Multimodal.decodeWav(bytes).map { case (rate, ch, nSamples, _) =>
      Info("wav", "pcm_s16le", rate.toLong, ch.toLong,
        if (rate == 0) 0L else nSamples * 1000L / rate, nSamples)
    }

  /** Serialize a 16-bit PCM WAV: RIFF/WAVE header + fmt + data with
    * `nPerChannel` samples per channel, byte content from `fill`.
    */
  def writeWav(rate: Int, channels: Int, nPerChannel: Int,
      fill: Int => Byte = i => (i % 251).toByte): Array[Byte] = {
    require(rate > 0 && channels >= 1 && nPerChannel >= 1)
    val dataLen = nPerChannel * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(channels.toShort)
    bb.putInt(rate)
    bb.putInt(rate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort) // block align
    bb.putShort(16) // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (i <- 1 to dataLen) bb.put(fill(i))
    bb.array()
  }

  // ------------------------------------------------------------------
  // MP3 (MPEG-1 Layer III frame headers)
  // ------------------------------------------------------------------

  /** kbps by bitrate index, MPEG-1 Layer III (index 0 = free-format
    * and 15 = reserved are both rejected).
    */
  private val Mp3Bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, 0)

  private val Mp3Rates = Array(44100, 48000, 32000, 0)

  private val Mp3SamplesPerFrame = 1152L

  /** Walk MPEG-1 Layer III frames: a leading ID3v2 tag (what crawled
    * MP3s actually start with) is skipped via its syncsafe length;
    * after that every frame must carry the sync word and consistent
    * version/layer, and the walk ends at the first non-frame byte
    * (which also handles a trailing ID3v1 'TAG' block). None unless at
    * least one complete frame parses.
    */
  def parseMp3(bytes: Array[Byte]): Option[Info] =
    try {
      var pos = 0
      if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
        // ID3v2 header: "ID3" ver(2) flags(1) size(4 × 7-bit syncsafe).
        // The size EXCLUDES the 10-byte footer a tag with flag 0x10
        // carries (ID3v2.4 §3.1) — without the extra skip the sync
        // check lands on footer bytes and a valid MP3 is rejected.
        val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        val footer = if ((bytes(5) & 0x10) != 0) 10 else 0
        pos = 10 + size + footer
        if (pos >= bytes.length) return None
      }
      var frames = 0L
      var rate = 0
      var channels = 0L
      var xingFrames = -1L // authoritative count from a Xing/Info header
      var ok = true
      while (ok && pos + 4 <= bytes.length) {
        val b0 = bytes(pos) & 0xff
        val b1 = bytes(pos + 1) & 0xff
        val b2 = bytes(pos + 2) & 0xff
        val b3 = bytes(pos + 3) & 0xff
        // sync (11 bits) + MPEG-1 (version bits 11) + Layer III (01)
        if (b0 != 0xff || (b1 & 0xfe) != 0xfa) ok = false
        else {
          val brIdx = (b2 >> 4) & 0xf
          val srIdx = (b2 >> 2) & 0x3
          val padding = (b2 >> 1) & 0x1
          if (brIdx == 0 || brIdx == 15 || srIdx == 3) ok = false
          else {
            val thisRate = Mp3Rates(srIdx)
            if (rate != 0 && thisRate != rate) ok = false
            else {
              rate = thisRate
              channels = if (((b3 >> 6) & 0x3) == 3) 1L else 2L
              val frameLen =
                144 * Mp3Bitrates(brIdx) * 1000 / thisRate + padding
              if (frameLen < 4 || pos + frameLen > bytes.length) ok = false
              else {
                // Xing (VBR) / Info (CBR) header in the FIRST frame,
                // after the side info (MPEG-1: 17 bytes mono, 32
                // stereo): flags bit 0 = a frame count follows — the
                // encoder's authoritative count of the AUDIO frames
                // after this header frame. VBR files need it: their
                // per-frame bitrates make any single-frame estimate
                // wrong, and players derive duration from this field.
                if (frames == 0L) {
                  val si = pos + 4 + (if (channels == 1L) 17 else 32)
                  if (si + 12 <= pos + frameLen) {
                    val t = new String(bytes, si, 4, "US-ASCII")
                    if ((t == "Xing" || t == "Info") &&
                      (bytes(si + 7) & 0x1) != 0)
                      xingFrames = ((bytes(si + 8) & 0xffL) << 24) |
                        ((bytes(si + 9) & 0xffL) << 16) |
                        ((bytes(si + 10) & 0xffL) << 8) |
                        (bytes(si + 11) & 0xffL)
                  }
                }
                frames += 1
                pos += frameLen
              }
            }
          }
        }
      }
      if (frames == 0) None
      else {
        // the Xing/Info frame is a header, not audio: when present its
        // count (of the frames AFTER it) is the duration authority
        val audioFrames = if (xingFrames >= 0L) xingFrames else frames
        Some(Info("mp3", "mp3", rate.toLong, channels,
          audioFrames * Mp3SamplesPerFrame * 1000L / rate, audioFrames))
      }
    } catch { case _: Exception => None }

  /** Serialize `frames` MPEG-1 Layer III frames at the given bitrate
    * index (1-14) and sample-rate index (0-2), mono iff `mono`, header
    * padding 0, body bytes from `fill(frameIdx)` (1-based).
    * `id3Bytes` > 0 prepends an ID3v2.3 tag with that much padding
    * payload (syncsafe-sized) — the leading-tag case real files carry.
    */
  def writeMp3(frames: Int, bitrateIdx: Int, rateIdx: Int, mono: Boolean,
      fill: Int => Byte = i => (i % 251).toByte,
      id3Bytes: Int = 0, id3Footer: Boolean = false): Array[Byte] = {
    require(frames > 0 && bitrateIdx >= 1 && bitrateIdx <= 14 &&
      rateIdx >= 0 && rateIdx <= 2 && id3Bytes >= 0 && id3Bytes < (1 << 28))
    require(!id3Footer || id3Bytes > 0, "footer needs a tag")
    val rate = Mp3Rates(rateIdx)
    val frameLen = 144 * Mp3Bitrates(bitrateIdx) * 1000 / rate
    val footerLen = if (id3Footer) 10 else 0
    val tagLen = if (id3Bytes == 0) 0 else 10 + id3Bytes + footerLen
    val out = new Array[Byte](tagLen + frames * frameLen)
    if (id3Bytes > 0) {
      out(0) = 'I'; out(1) = 'D'; out(2) = '3'
      out(3) = (if (id3Footer) 4 else 3).toByte // footer is a v2.4 flag
      if (id3Footer) out(5) = 0x10
      out(6) = ((id3Bytes >> 21) & 0x7f).toByte
      out(7) = ((id3Bytes >> 14) & 0x7f).toByte
      out(8) = ((id3Bytes >> 7) & 0x7f).toByte
      out(9) = (id3Bytes & 0x7f).toByte
      // tag payload: zero padding (a valid, empty tag body)
      if (id3Footer) {
        // footer mirrors the header with identifier "3DI" (§3.4)
        val fo = 10 + id3Bytes
        out(fo) = '3'; out(fo + 1) = 'D'; out(fo + 2) = 'I'
        out(fo + 3) = 4
        out(fo + 5) = 0x10
        System.arraycopy(out, 6, out, fo + 6, 4)
      }
    }
    for (f <- 0 until frames) {
      val base = tagLen + f * frameLen
      out(base) = 0xff.toByte
      out(base + 1) = 0xfb.toByte // MPEG-1, Layer III, no CRC
      out(base + 2) = ((bitrateIdx << 4) | (rateIdx << 2)).toByte
      out(base + 3) = (if (mono) 0xc0 else 0x00).toByte
      java.util.Arrays.fill(out, base + 4, base + frameLen, fill(f + 1))
    }
    out
  }

  /** Serialize a VBR MP3: a leading Xing header frame (at
    * `bitrateIdxs.head`'s frame size, "Xing" + flags 0x3 + frame count
    * + byte count after the side info) followed by one audio frame per
    * entry of `bitrateIdxs` — per-frame bitrates are what makes the
    * file VBR. The parsed duration/units must equal
    * `bitrateIdxs.length` frames (the Xing count), NOT the walked
    * count (which includes the header frame).
    */
  def writeMp3Vbr(bitrateIdxs: Seq[Int], rateIdx: Int, mono: Boolean,
      fill: Int => Byte = i => (i % 251).toByte): Array[Byte] = {
    require(bitrateIdxs.nonEmpty &&
      bitrateIdxs.forall(b => b >= 1 && b <= 14) &&
      rateIdx >= 0 && rateIdx <= 2)
    val rate = Mp3Rates(rateIdx)
    def frameLen(br: Int) = 144 * Mp3Bitrates(br) * 1000 / rate
    val out = new java.io.ByteArrayOutputStream()
    def beU32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def header(br: Int): Array[Byte] = Array(0xff.toByte, 0xfb.toByte,
      ((br << 4) | (rateIdx << 2)).toByte,
      (if (mono) 0xc0 else 0x00).toByte)
    // Xing frame: header + zeroed side info + tag
    val xingLen = frameLen(bitrateIdxs.head)
    val sideInfo = if (mono) 17 else 32
    val totalBytes = xingLen.toLong +
      bitrateIdxs.map(frameLen(_).toLong).sum
    val xing = new Array[Byte](xingLen)
    System.arraycopy(header(bitrateIdxs.head), 0, xing, 0, 4)
    val tagOff = 4 + sideInfo
    require(tagOff + 16 <= xingLen, s"Xing frame too small: $xingLen")
    System.arraycopy("Xing".getBytes("US-ASCII"), 0, xing, tagOff, 4)
    System.arraycopy(beU32(0x3L), 0, xing, tagOff + 4, 4) // frames|bytes
    System.arraycopy(beU32(bitrateIdxs.length.toLong), 0, xing, tagOff + 8, 4)
    System.arraycopy(beU32(totalBytes), 0, xing, tagOff + 12, 4)
    out.write(xing)
    for ((br, f) <- bitrateIdxs.zipWithIndex) {
      val len = frameLen(br)
      val frame = new Array[Byte](len)
      System.arraycopy(header(br), 0, frame, 0, 4)
      java.util.Arrays.fill(frame, 4, len, fill(f + 1))
      out.write(frame)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // FLAC (STREAMINFO)
  // ------------------------------------------------------------------

  /** Read the mandatory first metadata block (STREAMINFO, 14496-style
    * bit packing per the public FLAC format spec): sample rate (20
    * bits), channels-1 (3), bits-per-sample-1 (5), total samples (36).
    */
  def parseFlac(bytes: Array[Byte]): Option[Info] =
    try {
      if (bytes.length < 42 || bytes(0) != 'f' || bytes(1) != 'L' ||
        bytes(2) != 'a' || bytes(3) != 'C') return None
      // block header: 1 byte (last flag + type), 3 bytes length
      val blockType = bytes(4) & 0x7f
      val blockLen = ((bytes(5) & 0xff) << 16) | ((bytes(6) & 0xff) << 8) |
        (bytes(7) & 0xff)
      if (blockType != 0 || blockLen < 34 || 8 + blockLen > bytes.length)
        return None
      val s = 8 // STREAMINFO payload start
      val rate = ((bytes(s + 10) & 0xff) << 12) |
        ((bytes(s + 11) & 0xff) << 4) | ((bytes(s + 12) & 0xff) >> 4)
      val channels = (((bytes(s + 12) & 0xff) >> 1) & 0x7) + 1
      val total = (((bytes(s + 13) & 0xffL) & 0xf) << 32) |
        ((bytes(s + 14) & 0xffL) << 24) | ((bytes(s + 15) & 0xffL) << 16) |
        ((bytes(s + 16) & 0xffL) << 8) | (bytes(s + 17) & 0xffL)
      if (rate == 0) return None
      Some(Info("flac", "flac", rate.toLong, channels.toLong,
        total * 1000L / rate, total))
    } catch { case _: Exception => None }

  /** Serialize a FLAC header: magic + one STREAMINFO block (marked
    * last) + `tailBytes` of deterministic frame-data stand-in.
    */
  def writeFlac(rate: Int, channels: Int, totalSamples: Long,
      tailBytes: Int = 64,
      fill: Int => Byte = i => (i % 251).toByte): Array[Byte] = {
    require(rate > 0 && rate < (1 << 20) && channels >= 1 && channels <= 8 &&
      totalSamples >= 0 && totalSamples < (1L << 36))
    val info = new Array[Byte](34)
    info(0) = 0x10; info(1) = 0x00 // min blocksize 4096
    info(2) = 0x10; info(3) = 0x00 // max blocksize 4096
    // min/max framesize: 0 (unknown) — bytes 4..9 stay zero
    info(10) = ((rate >> 12) & 0xff).toByte
    info(11) = ((rate >> 4) & 0xff).toByte
    val bps = 16
    info(12) = (((rate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bps - 1) >> 4)).toByte
    info(13) = ((((bps - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toInt.toByte
    info(14) = ((totalSamples >> 24) & 0xff).toByte
    info(15) = ((totalSamples >> 16) & 0xff).toByte
    info(16) = ((totalSamples >> 8) & 0xff).toByte
    info(17) = (totalSamples & 0xff).toByte
    // bytes 18..33: unencoded-signal MD5, zeros = unknown
    val tail = Array.tabulate(tailBytes)(i => fill(i + 1))
    "fLaC".getBytes("US-ASCII") ++
      Array(0x80.toByte, 0x00.toByte, 0x00.toByte, 34.toByte) ++
      info ++ tail
  }

  // ------------------------------------------------------------------
  // OGG (pages; Vorbis + Opus id headers)
  // ------------------------------------------------------------------

  private def leU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def leU64(b: Array[Byte], i: Int): Long =
    leU32(b, i) | (leU32(b, i + 4) << 32)

  /** Walk the page sequence: codec from the first page's id header
    * (Vorbis or Opus), duration from the LAST page's granule position
    * (Vorbis: PCM samples at the declared rate; Opus: 48 kHz ticks
    * minus pre-skip, per RFC 7845 §4). None when no complete page
    * parses or the id header is neither codec.
    */
  def parseOgg(bytes: Array[Byte]): Option[Info] =
    try {
      var pos = 0
      var pages = 0L
      var lastGranule = 0L
      var codec = ""
      var rate = 0L
      var channels = 0L
      var preSkip = 0L
      var ok = true
      while (ok && pos + 27 <= bytes.length) {
        if (bytes(pos) != 'O' || bytes(pos + 1) != 'g' ||
          bytes(pos + 2) != 'g' || bytes(pos + 3) != 'S' ||
          bytes(pos + 4) != 0) ok = false
        else {
          val granule = leU64(bytes, pos + 6)
          val nSegs = bytes(pos + 26) & 0xff
          if (pos + 27 + nSegs > bytes.length) ok = false
          else {
            var payloadLen = 0
            var k = 0
            while (k < nSegs) {
              payloadLen += bytes(pos + 27 + k) & 0xff
              k += 1
            }
            val payloadStart = pos + 27 + nSegs
            if (payloadStart + payloadLen > bytes.length) ok = false
            else {
              if (pages == 0L) {
                // id header is the first packet of the first page
                if (payloadLen >= 30 && bytes(payloadStart) == 0x01 &&
                  new String(bytes, payloadStart + 1, 6,
                    "US-ASCII") == "vorbis") {
                  codec = "vorbis"
                  channels = (bytes(payloadStart + 11) & 0xff).toLong
                  rate = leU32(bytes, payloadStart + 12)
                } else if (payloadLen >= 19 &&
                  new String(bytes, payloadStart, 8,
                    "US-ASCII") == "OpusHead") {
                  codec = "opus"
                  channels = (bytes(payloadStart + 9) & 0xff).toLong
                  preSkip = (bytes(payloadStart + 10) & 0xffL) |
                    ((bytes(payloadStart + 11) & 0xffL) << 8)
                  rate = leU32(bytes, payloadStart + 12) // input rate
                } else ok = false
              }
              if (ok) {
                pages += 1
                if (granule > 0) lastGranule = granule
                pos = payloadStart + payloadLen
              }
            }
          }
        }
      }
      if (pages == 0 || codec.isEmpty || rate == 0) None
      else {
        val durMs = codec match {
          case "opus" => math.max(0L, lastGranule - preSkip) * 1000L / 48000L
          case _ => lastGranule * 1000L / rate
        }
        Some(Info("ogg", codec, rate, channels, durMs, pages))
      }
    } catch { case _: Exception => None }

  /** CRC32 per the OGG spec: poly 0x04c11db7, not reflected, init 0,
    * no final xor — distinct from zlib's CRC32.
    */
  private def oggCrc(b: Array[Byte]): Long = {
    var crc = 0L
    var i = 0
    while (i < b.length) {
      crc ^= (b(i) & 0xffL) << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000L) != 0) ((crc << 1) ^ 0x04c11db7L)
          else crc << 1
        crc &= 0xffffffffL
        k += 1
      }
      i += 1
    }
    crc
  }

  private def leBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((v >> (8 * k)) & 0xff).toByte)

  private def oggPage(headerType: Int, granule: Long, serial: Long,
      seq: Long, payload: Array[Byte]): Array[Byte] = {
    // lacing: 255-byte segments + terminator < 255
    val full = payload.length / 255
    val rem = payload.length % 255
    val segs = Array.tabulate(full + 1)(i =>
      if (i < full) 0xff.toByte else rem.toByte)
    val head = "OggS".getBytes("US-ASCII") ++ Array(0.toByte,
      headerType.toByte) ++ leBytes(granule, 8) ++ leBytes(serial, 4) ++
      leBytes(seq, 4) ++ leBytes(0L, 4) ++ Array(segs.length.toByte) ++ segs
    val page = head ++ payload
    val crc = oggCrc(page)
    System.arraycopy(leBytes(crc, 4), 0, page, 22, 4)
    page
  }

  /** Serialize an OGG stream: page 0 = id header (BOS), then
    * `dataPages` fill pages, the last marked EOS carrying
    * `finalGranule`. Vorbis id header when `opus` is false.
    */
  def writeOgg(opus: Boolean, channels: Int, rate: Long, preSkip: Int,
      finalGranule: Long, dataPages: Int,
      fill: Int => Byte = i => (i % 251).toByte): Array[Byte] = {
    require(dataPages >= 1 && channels >= 1)
    val idHeader: Array[Byte] =
      if (opus)
        "OpusHead".getBytes("US-ASCII") ++ Array(1.toByte,
          channels.toByte) ++ leBytes(preSkip.toLong, 2) ++
          leBytes(rate, 4) ++ leBytes(0L, 2) ++ Array(0.toByte)
      else
        Array(0x01.toByte) ++ "vorbis".getBytes("US-ASCII") ++
          leBytes(0L, 4) ++ Array(channels.toByte) ++ leBytes(rate, 4) ++
          leBytes(0L, 4) ++ leBytes(0L, 4) ++ leBytes(0L, 4) ++
          Array(0xb8.toByte, 0x01.toByte)
    val serial = 0x47524654L // 'GRFT'
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= oggPage(0x02, 0L, serial, 0L, idHeader) // BOS, granule 0
    for (p <- 1 to dataPages) {
      val eos = p == dataPages
      val granule = if (eos) finalGranule else finalGranule * p / dataPages
      val payload = Array.tabulate(40 + 7 * p)(i => fill(p + i))
      out ++= oggPage(if (eos) 0x04 else 0x00, granule, serial,
        p.toLong, payload)
    }
    out.toArray
  }
}
