package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, plus decode / resize / feature-extraction stages.
  *
  * Decode is REAL for every format the JDK ships a codec for — PNG,
  * JPEG, BMP, GIF via `javax.imageio` and WAV/PCM via a pure-byte RIFF
  * parser (no external libraries involved). VIDEO containers are parsed
  * for real too: [[Mp4]] walks the ISO-BMFF boxes (a pure-byte public
  * format needing no codec) to recover track dimensions, keyframe
  * positions, and exact per-sample byte windows, so [[sampleFrames]]
  * cuts true frame payloads at true frame boundaries. Only pixel-level
  * video DECODE has no JDK codec; payloads that no parser accepts fall
  * back to the clearly-marked stub path, so the pipeline is total
  * either way.
  *
  * Spark-side design:
  *  - media rides in a `binary` column next to typed metadata, exactly
  *    how 100 TB image datasets store shards;
  *  - decode runs in `mapPartitions` so decoder init amortizes once per
  *    partition (the Scala analog of a Pandas UDF over mapInPandas);
  *  - output is a fixed-width feature vector + dimensions, ready for the
  *    Similarity operators.
  */
object Multimodal {

  // ImageIO's default stream cache spools every read/write through a
  // disk temp file (File.createTempFile: a SecureRandom-locked name +
  // create/delete per call). All payloads here are in-memory byte
  // arrays, so the disk spool is pure overhead single-threaded and a
  // filesystem/lock stampede when 32 tasks decode concurrently
  // (measured: the parallelized PNG shard pipeline burned ~130 CPU-s
  // in 16 s wall before this, ~2 CPU-s after). Memory-cached streams
  // are the right mode for byte-array media at every scale.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRow(doc_id: Long, bytes: Array[Byte], mime: String)

  final case class MediaFeature(
      doc_id: Long, width: Int, height: Int, byte_len: Long,
      feature: Array[Float])

  final case class AudioFeature(
      doc_id: Long, sample_rate: Int, channels: Int, n_samples: Long,
      mean_abs: Double)

  // --- real decoders (JDK codecs only) ---

  /** Real image decode via the JDK's built-in ImageIO codecs (PNG, JPEG,
    * BMP, GIF): dimensions + an 8-float feature (mean luma per
    * horizontal band). None when the payload is not a decodable image.
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val bands = 8
        val feature = Array.tabulate(bands) { b =>
          val y0 = h.toLong * b / bands
          val y1 = math.max(y0 + 1, h.toLong * (b + 1) / bands)
          var sum = 0.0
          var n = 0L
          var y = y0
          while (y < y1 && y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y.toInt)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val bl = rgb & 0xff
              sum += (0.299 * r + 0.587 * g + 0.114 * bl) / 255.0
              n += 1
              x += 1
            }
            y += 1
          }
          if (n == 0) 0f else (sum / n).toFloat
        }
        Some((w, h, feature))
      }
    } catch { case _: Exception => None }

  /** Real image resize via AWT (headless-safe): decode, scale with
    * drawImage, re-encode as PNG. None when the payload is not a
    * decodable image.
    */
  def resizeImage(bytes: Array[Byte], targetW: Int,
      targetH: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.drawImage(img, 0, 0, targetW, targetH, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** Real WAV/PCM decode — a pure-byte RIFF parser (no codec library
    * exists or is needed for uncompressed PCM): sample rate, channels,
    * sample count, and mean absolute amplitude (normalized to [0,1]) of
    * 16-bit samples. None for non-WAV payloads AND for WAVs whose
    * sample format is not 16-bit PCM (8/24/32-bit and float variants
    * are valid files this parser deliberately does not handle).
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    def u16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int) = (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
      ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    def tag(i: Int) = new String(bytes, i, 4, "US-ASCII")
    try {
      if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var pos = 12
      var rate = 0
      var channels = 0
      var bits = 0
      var result: Option[(Int, Int, Long, Double)] = None
      while (pos + 8 <= bytes.length && result.isEmpty) {
        val id = tag(pos)
        val sz = u32(pos + 4).toInt
        // a hostile/corrupt chunk length (negative after truncation, or
        // pointing past the payload) must not walk the cursor backwards
        // into an infinite loop — treat as end of parseable input
        if (sz < 0) return result
        if (id == "fmt ") {
          channels = u16(pos + 10)
          rate = u32(pos + 12).toInt
          bits = u16(pos + 22)
        } else if (id == "data" && bits == 16 && channels > 0) {
          val end = math.min(bytes.length, pos + 8 + sz)
          var i = pos + 8
          var sum = 0.0
          var n = 0L
          while (i + 1 < end) {
            val s = u16(i).toShort
            sum += math.abs(s.toDouble) / 32768.0
            n += 1
            i += 2
          }
          result = Some((rate, channels,
            n / math.max(1, channels), if (n == 0) 0.0 else sum / n))
        }
        pos += 8 + sz + (sz & 1) // chunks are 2-byte aligned
      }
      result
    } catch { case _: Exception => None }
  }

  /** Luma grid of a decoded image scaled to w×h via AWT (the same
    * headless-safe path as [[resizeImage]]): row-major doubles in [0,1].
    */
  private def lumaGrid(img: java.awt.image.BufferedImage, w: Int,
      h: Int): Array[Double] = {
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    Array.tabulate(w * h) { i =>
      val rgb = out.getRGB(i % w, i / w)
      val r = (rgb >> 16) & 0xff
      val gg = (rgb >> 8) & 0xff
      val b = rgb & 0xff
      (0.299 * r + 0.587 * gg + 0.114 * b) / 255.0
    }
  }

  /** 64-bit average hash (aHash): 8×8 luma grid, bit i set when pixel i
    * is at or above the grid mean. Identical images hash identically;
    * rescaled/re-encoded copies land within a few bits. None when no JDK
    * codec accepts the payload.
    */
  def aHash(bytes: Array[Byte]): Option[Long] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val g = lumaGrid(img, 8, 8)
        val mean = g.sum / g.length
        g.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
          if (v >= mean) acc | (1L << i) else acc
        }
      }
    } catch { case _: Exception => None }

  /** 64-bit difference hash (dHash): 9×8 luma grid, bit set when the
    * left pixel is brighter than its right neighbor — gradient structure,
    * more robust than aHash to global brightness shifts.
    */
  def dHash(bytes: Array[Byte]): Option[Long] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
        val g = lumaGrid(img, 9, 8)
        var acc = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (g(y * 9 + x) > g(y * 9 + x + 1))
              acc |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        acc
      }
    } catch { case _: Exception => None }

  /** Perceptual-hash stage over the media column (mapPartitions, codec
    * init amortized per partition): (doc_id, a_hash, d_hash), null
    * hashes for payloads no JDK codec decodes. Feed the result to
    * [[NearDup.hammingNearDupPairs]] (bands = 4, bandBits = 16,
    * maxDist ≤ 3) for corpus-scale visual near-dup detection.
    */
  def perceptualHashes(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        (id, aHash(b), dHash(b))
      })
      .toDF("doc_id", "a_hash", "d_hash")
  }

  /** Pack a text column as a binary media column (stand-in for image
    * bytes in the fixtures) with metadata.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("bytes"),
      lit("application/octet-stream").as("mime"))

  /** Ingest a directory of media files as the standard media frame via
    * Spark's builtin binaryFile source (one row per file, content as
    * binary, scan-level pathGlobFilter pushdown): doc_id = h32 of the
    * file path (stable across runs), mime guessed from the extension.
    * The scalable on-ramp from object storage into [[extractFeatures]] /
    * [[extractAudioFeatures]].
    */
  def readBinaryDir(spark: org.apache.spark.sql.SparkSession, path: String,
      glob: String = "*"): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(path)
      .select(
        call_function(graft.functions.GraftFunctions.H32Name, col("path"))
          .as("doc_id"),
        col("content").as("bytes"),
        when(lower(col("path")).endsWith(".png"), "image/png")
          .when(lower(col("path")).rlike("\\.(jpg|jpeg)$"), "image/jpeg")
          .when(lower(col("path")).endsWith(".gif"), "image/gif")
          .when(lower(col("path")).endsWith(".bmp"), "image/bmp")
          .when(lower(col("path")).endsWith(".wav"), "audio/wav")
          .when(lower(col("path")).rlike("\\.(mp4|m4v|mov)$"), "video/mp4")
          .when(lower(col("path")).rlike("\\.(webm|mkv)$"), "video/webm")
          .when(lower(col("path")).endsWith(".avi"), "video/x-msvideo")
          .when(lower(col("path")).rlike("\\.(mp3|flac|ogg|m4a)$"),
            "audio/*")
          .otherwise("application/octet-stream").as("mime"),
        col("path"))
  }

  /** STUB decoder — deterministic fallback for payloads no JDK codec
    * accepts (the fixtures' text bytes, and compressed video, which has
    * no JDK decoder). Derives pseudo dimensions and an 8-float feature
    * from the bytes so the pipeline stays total; decodable images never
    * reach this path.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    val len = bytes.length
    val width = 64 + (len % 577)
    val height = 64 + ((len * 7) % 417)
    val feature = Array.tabulate(8) { i =>
      if (len == 0) 0f
      else bytes(i % len).toFloat / 255f
    }
    (width, height, feature)
  }

  /** STUB resize — deterministic fallback for undecodable payloads:
    * real plumbing (binary in, binary out, new dimensions), fake pixels.
    * Decodable images go through [[resizeImage]] instead.
    */
  def resizeStub(bytes: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val out = new Array[Byte](math.max(1, (targetW * targetH) / 64))
    var i = 0
    while (i < out.length) {
      out(i) = if (bytes.isEmpty) 0 else bytes(i % bytes.length)
      i += 1
    }
    out
  }

  /** STUB frame sampling — deterministic fallback for payloads
    * [[Mp4.parse]] rejects (non-video bytes, truncated/hostile
    * containers): every `stride`-th 64-byte window of the payload
    * becomes a "frame". Valid MP4s never reach this path — they go
    * through [[frameSample]], which cuts REAL sample windows.
    */
  def frameSampleStub(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] = {
    require(stride > 0, s"stride must be positive, got $stride")
    bytes.grouped(64).zipWithIndex
      .collect { case (frame, i) if i % stride == 0 => frame }
      .toSeq
  }

  /** The parsed first video track, but ONLY when every declared sample
    * window lies inside the payload. A moov-first MP4 with a truncated
    * mdat still parses (the sample tables are intact) — silently
    * cutting the in-range prefix would emit a PARTIAL frame set with
    * renumbered indices that callers cannot distinguish from a short
    * video, so a truncated container is treated as unparseable: None,
    * same as any other hostile payload.
    */
  private def completeVideoTrack(bytes: Array[Byte]): Option[Mp4.Track] =
    Mp4.parse(bytes).flatMap(_.videoTracks.headOption)
      .filter(_.samples.forall(s =>
        s.offset >= 0 && s.offset + s.size <= bytes.length))

  /** The WebM twin of [[completeVideoTrack]]: parsed meta + video
    * track + that track's SimpleBlocks, but only when there IS a video
    * track with at least one block and every declared frame window
    * lies inside the payload (same truncation = unparseable contract).
    */
  private def completeWebmVideo(bytes: Array[Byte])
      : Option[(Webm.Meta, Webm.VideoTrack, Vector[Webm.Block])] =
    Webm.parse(bytes).flatMap { m =>
      m.videoTrack.map(t => (m, t, m.videoBlocks)).filter {
        case (_, _, bs) => bs.nonEmpty && bs.forall(b =>
          b.offset >= 0 && b.offset + b.size <= bytes.length)
      }
    }

  /** The AVI twin: parsed meta with every frame window in range. */
  private def completeAviVideo(bytes: Array[Byte]): Option[Avi.Meta] =
    Avi.parse(bytes).filter(m => m.frames.nonEmpty &&
      m.frames.forall(f =>
        f.offset >= 0 && f.offset + f.size <= bytes.length))

  /** The MPEG twin — windows are into the reassembled elementary
    * stream (a picture can span program-stream PES packets), and the
    * parser's walk bounds them by construction; only non-emptiness is
    * left to check.
    */
  private def completeMpegVideo(bytes: Array[Byte]): Option[Mpeg.Meta] =
    Mpeg.parse(bytes).filter(m => m.pictures.nonEmpty &&
      m.pictures.forall(p =>
        p.esOffset >= 0 && p.esOffset + p.size <= m.es.length))

  /** REAL frame sampling for ISO-BMFF video: every `stride`-th sample
    * of the first video track, cut at the exact byte windows the
    * container's sample tables declare (stsz/stsc/stco — see
    * [[Mp4]]). Returns None when the payload is not a parseable MP4
    * with a video track whose declared windows all fit the payload
    * (truncated mdat = unparseable, never a silently partial frame
    * set); callers fall back to [[frameSampleStub]].
    */
  def frameSample(bytes: Array[Byte],
      stride: Int): Option[Seq[Array[Byte]]] = {
    require(stride > 0, s"stride must be positive, got $stride")
    completeVideoTrack(bytes).map { t =>
      t.samples.zipWithIndex
        .collect { case (s, i) if i % stride == 0 =>
          java.util.Arrays.copyOfRange(bytes, s.offset.toInt,
            (s.offset + s.size).toInt)
        }: Seq[Array[Byte]]
    }.orElse(completeWebmVideo(bytes).map { case (_, _, bs) =>
      bs.zipWithIndex.collect { case (b, i) if i % stride == 0 =>
        java.util.Arrays.copyOfRange(bytes, b.offset.toInt,
          (b.offset + b.size).toInt)
      }: Seq[Array[Byte]]
    }).orElse(completeAviVideo(bytes).map { m =>
      m.frames.zipWithIndex.collect { case (f, i) if i % stride == 0 =>
        java.util.Arrays.copyOfRange(bytes, f.offset.toInt,
          (f.offset + f.size).toInt)
      }: Seq[Array[Byte]]
    }).orElse(completeMpegVideo(bytes).map { m =>
      m.pictures.zipWithIndex.collect { case (p, i) if i % stride == 0 =>
        java.util.Arrays.copyOfRange(m.es, p.esOffset.toInt,
          (p.esOffset + p.size).toInt)
      }
    })
  }

  /** Keyframes only — the standard cheap video summarization cut:
    * exactly the container's declared sync samples, at their declared
    * byte windows. None for truncated containers (see
    * [[completeVideoTrack]]).
    */
  def keyframes(bytes: Array[Byte]): Option[Seq[Array[Byte]]] =
    completeVideoTrack(bytes).map { t =>
      t.samples.collect {
        case s if s.sync =>
          java.util.Arrays.copyOfRange(bytes, s.offset.toInt,
            (s.offset + s.size).toInt)
      }: Seq[Array[Byte]]
    }.orElse(completeWebmVideo(bytes).map { case (_, _, bs) =>
      bs.collect {
        case b if b.keyframe =>
          java.util.Arrays.copyOfRange(bytes, b.offset.toInt,
            (b.offset + b.size).toInt)
      }: Seq[Array[Byte]]
    }).orElse(completeAviVideo(bytes).map { m =>
      m.frames.collect {
        case f if f.keyframe =>
          java.util.Arrays.copyOfRange(bytes, f.offset.toInt,
            (f.offset + f.size).toInt)
      }: Seq[Array[Byte]]
    }).orElse(completeMpegVideo(bytes).map { m =>
      m.pictures.collect {
        case p if p.keyframe =>
          java.util.Arrays.copyOfRange(m.es, p.esOffset.toInt,
            (p.esOffset + p.size).toInt)
      }
    })

  /** Resize stage over the media column (mapPartitions, codec init
    * amortized per partition): real AWT scaling for decodable images,
    * stub fallback otherwise.
    */
  def resize(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val out = resizeImage(b, targetW, targetH)
          .getOrElse(resizeStub(b, targetW, targetH))
        (id, out, targetW, targetH)
      })
      .toDF("doc_id", "bytes", "width", "height")
  }

  /** Frame-sampling stage: one output row per sampled frame. Real
    * ISO-BMFF sample windows for parseable MP4s ([[frameSample]]);
    * the deterministic stub only for payloads no parser accepts.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        frameSample(b, stride).getOrElse(frameSampleStub(b, stride))
          .zipWithIndex.map { case (f, i) => (id, i.toLong, f) }
      })
      .toDF("doc_id", "frame_idx", "frame")
  }

  /** One deterministic single-track MP4 per input id, built distributed
    * (the muxer runs where the data lives; the driver never sees a
    * payload). Every parsed property is a closed-form function of the
    * id — the q_video_* oracles recompute them in SQL:
    * n = 1 + (id%7)*3 samples of 50+((id+i)%64) bytes (1-based i),
    * filled with byte (id+i)%251, keyframe every 3rd sample,
    * 16*(1+id%20) x 16*(1+id%12), 25 fps at timescale 1000, 4 samples
    * per chunk (multi-chunk stsc/stco).
    *
    * Lives HERE, not in the query registry: executor tasks load the
    * lambda's enclosing class, and the registry object's initializer
    * (the full query + oracle map) is driver-only code — under
    * multi-JVM executors it fails class-init (measured: local-cluster
    * NoClassDefFoundError on ExtQueries$ until this moved).
    */
  def syntheticVideoMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (1 + (id % 7) * 3).toInt
      val bytes = Mp4.write(Mp4.BuildSpec(
        width = (16 * (1 + id % 20)).toInt,
        height = (16 * (1 + id % 12)).toInt,
        sampleSizes = (1 to n).map(i => (50 + ((id + i) % 64)).toInt),
        syncEvery = 3,
        fill = i => ((id + i) % 251).toByte))
      (id, bytes, "video/mp4")
    }).toDF("doc_id", "bytes", "mime")
  }

  /** One deterministic FRAGMENTED MP4 (moov/mvex + moof/mdat) per id —
    * the streaming-era layout real crawls contain. Same registry
    * placement rule as [[syntheticVideoMedia]]. Closed form per id:
    * (1 + id%4) fragments of (2 + id%5) samples each; global sample i
    * (1-based) is 40+((id+i)%50) bytes of byte value (id*3+i)%251,
    * keyframe every 3rd sample; 16*(1+id%20) x 16*(1+id%12) at 25 fps,
    * timescale 1000. Muxer-path variety is id-keyed so the corpus
    * covers every parser branch: explicit tfhd base_data_offset when
    * id%3==0 (default-base-is-moof otherwise), 2 truns per fragment
    * when id is odd, an elst with media_time 40 when id%5==0.
    */
  def fragVideoBytes(id: Long): Array[Byte] = {
    val frags = (1 + id % 4).toInt
    val spf = (2 + id % 5).toInt
    Mp4.writeFragmented(Mp4.FragBuildSpec(
      width = (16 * (1 + id % 20)).toInt,
      height = (16 * (1 + id % 12)).toInt,
      fragmentSizes = Seq.tabulate(frags)(f =>
        Seq.tabulate(spf) { j =>
          val i = f * spf + j + 1
          (40 + ((id + i) % 50)).toInt
        }),
      syncEvery = 3,
      fill = i => ((id * 3 + i) % 251).toByte,
      explicitBaseOffset = id % 3 == 0,
      trunsPerFragment = if (id % 2 == 1) 2 else 1,
      elstMediaTime = if (id % 5 == 0) 40L else -1L))
  }

  /** Fragmented-only media frame (see [[fragVideoBytes]]). */
  def syntheticFragVideoMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      (id, fragVideoBytes(id), "video/mp4")
    }).toDF("doc_id", "bytes", "mime")
  }

  /** MIXED-layout corpus — what a crawled video shard actually looks
    * like: even ids get the progressive single-moov file
    * ([[syntheticVideoMedia]]'s closed form), odd ids the fragmented
    * one ([[fragVideoBytes]]). One parse path must serve both.
    */
  def syntheticMixedVideoMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val bytes =
        if (id % 2 == 0) {
          val n = (1 + (id % 7) * 3).toInt
          Mp4.write(Mp4.BuildSpec(
            width = (16 * (1 + id % 20)).toInt,
            height = (16 * (1 + id % 12)).toInt,
            sampleSizes = (1 to n).map(i => (50 + ((id + i) % 64)).toInt),
            syncEvery = 3,
            fill = i => ((id + i) % 251).toByte))
        } else fragVideoBytes(id)
      (id, bytes, "video/mp4")
    }).toDF("doc_id", "bytes", "mime")
  }

  final case class GifRow(doc_id: Long, version: String, width: Long,
      height: Long, n_frames: Long, duration_ms: Long, loop_count: Long,
      f1_size: Long, f1_first_byte: Long)

  /** Animated-GIF structure stage ([[Gif]]): frame count, summed
    * GCE delays, NETSCAPE loop count, and — the offset witness — the
    * first frame's LZW-data window size and first byte. Non-GIF rows
    * and truncated streams (any window out of range) are dropped.
    */
  def gifMeta(media: DataFrame): Dataset[GifRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        Gif.parse(b)
          .filter(_.frames.forall(f =>
            f.dataOffset >= 0 && f.dataOffset + f.dataSize <= b.length))
          .map { m =>
            val f1 = m.frames.head
            GifRow(id, m.version, m.width.toLong, m.height.toLong,
              m.frames.size.toLong, m.durationMs, m.loopCount.toLong,
              f1.dataSize,
              if (f1.dataSize > 0) (b(f1.dataOffset.toInt) & 0xff).toLong
              else -1L)
          }
      })
  }

  /** One deterministic animated GIF per id (same registry placement
    * rule as [[syntheticVideoMedia]]): n = 2 + (id%7) frames, frame i
    * carrying one 20+((id+4i)%60)-byte data sub-block filled with
    * (id*9+i)%251, delay 4+((id+i)%6) centiseconds; NETSCAPE loop
    * id%5 present iff id%3==0; (10+id%300) x (10+id%200).
    */
  def syntheticGifMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (2 + id % 7).toInt
      val bytes = Gif.write(Gif.BuildSpec(
        width = (10 + id % 300).toInt,
        height = (10 + id % 200).toInt,
        frameDataSizes = (1 to n).map(i => (20 + ((id + 4 * i) % 60)).toInt),
        delaysCs = (1 to n).map(i => (4 + ((id + i) % 6)).toInt),
        loop = if (id % 3 == 0) (id % 5).toInt else -1,
        fill = i => ((id * 9 + i) % 251).toByte))
      (id, bytes, "image/gif")
    }).toDF("doc_id", "bytes", "mime")
  }

  final case class ExifRow(doc_id: Long, width: Long, height: Long,
      orientation: Long, make: String, model: String,
      dt_original: String, lat_arcsec: Long, lon_arcsec: Long)

  /** JPEG/EXIF metadata stage: SOF coded dimensions + APP1 orientation
    * and camera make/model ([[Exif]]) WITHOUT decoding pixels — the
    * image-side twin of [[videoMeta]]/[[audioMeta]]. Non-JPEG rows are
    * dropped.
    */
  def exifMeta(media: DataFrame): Dataset[ExifRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        Exif.parse(b).map(m => ExifRow(id, m.width.toLong, m.height.toLong,
          m.orientation.toLong, m.make, m.model, m.dateTimeOriginal,
          m.latArcsec, m.lonArcsec))
      })
  }

  /** Per-JVM memo of ImageIO-encoded host images by (format, w, h).
    * Fixture dims cycle through small moduli, so a corpus-sized
    * generator pays ~10^2 encodes instead of ~10^5 — the benched cost
    * is then the DECODE/PARSE operators, not fixture encoding. Content
    * is a deterministic solid color per (w, h): the projected fields
    * (dims, EXIF, token counts) never depend on pixels.
    */
  private val hostImageMemo =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), Array[Byte]]

  private def encodedHostImage(format: String, w: Int, h: Int): Array[Byte] =
    hostImageMemo.getOrElseUpdate((format, w, h), {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color((w * 37) % 255, (h * 53) % 255,
        (w + h) % 255))
      g.fillRect(0, 0, w, h)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    })

  /** One REAL JPEG per id (ImageIO-encoded image — an actual
    * decoder-accepted file, not a byte sketch; hosts memoized per
    * (w, h), see [[encodedHostImage]]) with a spliced EXIF APP1.
    * Closed form per id: 16*(1+id%12) x 16*(1+id%9), orientation
    * 1+(id%8), make "Make"+(id%3), model "Model"+(id%4),
    * DateTimeOriginal (Exif sub-IFD) at year 2000+(id%22), month
    * 1+(id%12), day 1+(id%28), time id%24:id%60:id%60, GPS sub-IFD at
    * lat (id*31)%324001-162000 / lon (id*57)%1296001-648000 arcsec
    * (both hemispheres exercised). Same registry placement rule as
    * [[syntheticVideoMedia]].
    */
  def syntheticExifJpegMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val w = (16 * (1 + id % 12)).toInt
      val h = (16 * (1 + id % 9)).toInt
      val dt = f"${2000 + id % 22}%04d:${1 + id % 12}%02d:${1 + id % 28}%02d " +
        f"${id % 24}%02d:${id % 60}%02d:${id % 60}%02d"
      val jpeg = Exif.insertApp1(encodedHostImage("jpg", w, h),
        orientation = (1 + id % 8).toInt,
        make = s"Make${id % 3}", model = s"Model${id % 4}",
        dateTimeOriginal = dt,
        latArcsec = (id * 31) % 324001 - 162000,
        lonArcsec = (id * 57) % 1296001 - 648000,
        hasGps = true)
      (id, jpeg, "image/jpeg")
    }).toDF("doc_id", "bytes", "mime")
  }

  /** Explode a frame of TAR shard payloads into WebDataset members:
    * (doc_id, member, key, ext, bytes) — key/ext split the basename at
    * its FIRST dot (the WebDataset convention: `000123.seg.jpg` →
    * key `000123`, ext `seg.jpg`, so all of one sample's modalities
    * share a key). Non-tar payloads and non-file members contribute
    * nothing.
    */
  def webdatasetMembers(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        Tar.members(b).iterator.collect {
          case m if m.typeflag == '0' =>
            val base = m.name.substring(m.name.lastIndexOf('/') + 1)
            val dot = base.indexOf('.')
            val (key, ext) =
              if (dot < 0) (base, "") else (base.substring(0, dot),
                base.substring(dot + 1))
            (id, m.name, key, ext,
              java.util.Arrays.copyOfRange(b, m.offset.toInt,
                (m.offset + m.size).toInt))
        }
      }).toDF("doc_id", "member", "key", "ext", "bytes")
  }

  /** Directory-of-shards on-ramp: binaryFile over `*.tar` →
    * [[webdatasetMembers]] — the img2dataset/WebDataset ingest shape
    * (each tar is one task's worth of samples; member windows are cut
    * where the shard bytes already live).
    */
  def readWebDataset(spark: org.apache.spark.sql.SparkSession,
      path: String, glob: String = "*.tar"): DataFrame =
    webdatasetMembers(
      readBinaryDir(spark, path, glob)
        .select(col("doc_id"), col("bytes")))

  /** End-to-end WebDataset sample table: `.png` members through the
    * REAL ImageIO decode, `.txt` members whitespace-tokenized, joined
    * per (shard, key) — the shard-to-training-sample pipeline in one
    * pass over the member frame. Samples missing either modality drop
    * (inner join): the multimodal-pairing contract.
    */
  def wdsSampleTable(members: DataFrame): DataFrame = {
    val spark = members.sparkSession
    import spark.implicits._
    val imgs = members.where(col("ext") === "png")
      .select("doc_id", "key", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, k, b) =>
        decodeImage(b).map { case (w, h, _) =>
          (id, k, w.toLong, h.toLong)
        }
      }).toDF("doc_id", "key", "width", "height")
    val txts = members.where(col("ext") === "txt")
      .select("doc_id", "key", "bytes").as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, k, b) =>
        (id, k,
          new String(b, "UTF-8").split("\\s+").count(_.nonEmpty).toLong)
      }).toDF("doc_id", "key", "n_tokens")
    imgs.join(txts, Seq("doc_id", "key"))
  }

  /** WebDataset shards whose `.png` members are REAL ImageIO-encoded
    * PNGs (decoder-valid; hosts memoized per (w, h), see
    * [[encodedHostImage]]) and `.txt` members whitespace token runs —
    * closed form per (id, sample j of 2+(id%3)): png dims
    * (8+((id+j)%16)) x (8+((id*3+j)%12)), text of 3+((id+j)%5) "tok"
    * tokens. Only dims/token counts are projected, so per-id pixel
    * content is not needed.
    */
  def syntheticPngWebdataset(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (2 + id % 3).toInt
      val entries = (1 to n).flatMap { j =>
        val w = (8 + ((id + j) % 16)).toInt
        val h = (8 + ((id * 3 + j) % 12)).toInt
        val text = Seq.fill((3 + ((id + j) % 5)).toInt)("tok").mkString(" ")
        Seq((s"${id}_$j.png", encodedHostImage("png", w, h)),
          (s"${id}_$j.txt", text.getBytes("UTF-8")))
      }
      (id, Tar.write(entries), "application/x-tar")
    }).toDF("doc_id", "bytes", "mime")
  }

  /** ZIP sample shards with REAL ImageIO-encoded PNGs (stored — PNG is
    * already deflated) and token-run `.txt` captions (DEFLATE'd) —
    * the zip-format twin of [[syntheticPngWebdataset]], proving the
    * shard-to-sample pipeline is container-agnostic. Closed form per
    * (id, sample j of 2+(id%4)): png dims (8+((id*2+j)%16)) x
    * (8+((id+2*j)%12)), text of 2+((id*j)%6) "tok" tokens.
    */
  def syntheticPngZipShards(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (2 + id % 4).toInt
      val entries = (1 to n).flatMap { j =>
        val w = (8 + ((id * 2 + j) % 16)).toInt
        val h = (8 + ((id + 2 * j) % 12)).toInt
        val text = Seq.fill((2 + ((id * j) % 6)).toInt)("tok").mkString(" ")
        Seq((s"${id}_$j.png", encodedHostImage("png", w, h), false),
          (s"${id}_$j.txt", text.getBytes("UTF-8"), true))
      }
      (id, Zip.write(entries), "application/zip")
    }).toDF("doc_id", "bytes", "mime")
  }

  /** Group members back into samples: one row per (doc_id, key) with
    * an ext → bytes map — the unit a multimodal training loader
    * consumes.
    */
  def webdatasetSamples(members: DataFrame): DataFrame =
    members.groupBy("doc_id", "key")
      .agg(map_from_arrays(collect_list(col("ext")),
        collect_list(col("bytes"))).as("parts"),
        count(lit(1)).as("n_parts"))

  /** One deterministic WebDataset tar shard per id (same registry
    * placement rule as [[syntheticVideoMedia]]): n = 2 + (id%4)
    * samples, each with an `.img` member of 37+((id+j)%50) bytes
    * filled with (id+2j)%251 and a `.txt` member of 10+((id*j)%20)
    * bytes filled with (id+3j)%251 — the q_webdataset oracle
    * recomputes all of it.
    */
  def syntheticWebdatasetMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (2 + id % 4).toInt
      val entries = (1 to n).flatMap { j =>
        Seq(
          (s"${id}_$j.img",
            Array.fill((37 + ((id + j) % 50)).toInt)(
              ((id + 2 * j) % 251).toByte)),
          (s"${id}_$j.txt",
            Array.fill((10 + ((id * j) % 20)).toInt)(
              ((id + 3 * j) % 251).toByte)))
      }
      (id, Tar.write(entries), "application/x-tar")
    }).toDF("doc_id", "bytes", "mime")
  }

  /** Keyframe rows — one output row per sync sample, cut at the
    * container-declared windows: (doc_id, kf_idx, frame). Non-video
    * payloads contribute nothing.
    */
  def keyframeRows(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        keyframes(b).getOrElse(Seq.empty)
          .zipWithIndex.map { case (f, i) => (id, i.toLong, f) }
      })
      .toDF("doc_id", "kf_idx", "frame")
  }

  final case class VideoMeta(
      doc_id: Long, brand: String, codec: String, width: Long, height: Long,
      n_samples: Long, n_keyframes: Long, duration_ms: Long,
      total_sample_bytes: Long, kf1_size: Long, kf1_first_byte: Long,
      media_time: Long)

  /** Container-metadata stage for video media: parse each payload's
    * ISO-BMFF boxes and emit the first video track's dimensions, codec,
    * timing, keyframe count, and — as the end-to-end witness that the
    * sample OFFSETS are right, not just the counts — the size and first
    * payload byte of the first keyframe, read back out of the file at
    * the window the sample tables declare. Unparseable payloads are
    * dropped (they belong to other modalities), and so are truncated
    * ones — any declared window running past the payload drops the row
    * rather than emitting metadata for frames that are not there (see
    * [[completeVideoTrack]]).
    */
  def videoMeta(media: DataFrame): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        mp4VideoMeta(id, b).orElse(webmVideoMeta(id, b))
          .orElse(aviVideoMeta(id, b)).orElse(mpegVideoMeta(id, b))
      })
  }

  /** MPEG-1 rows in the same [[VideoMeta]] shape: brand distinguishes
    * the program-stream wrap from a bare elementary stream, samples =
    * pictures, keyframes = I pictures, duration from the frame-rate
    * code. kf1_first_byte reads the first PAYLOAD byte (after the
    * 8-byte start-code + picture header) of the first keyframe — the
    * offset-math witness against the REASSEMBLED elementary stream,
    * which for a program stream proves the PES demux too.
    */
  private def mpegVideoMeta(id: Long, b: Array[Byte]): Option[VideoMeta] =
    completeMpegVideo(b).flatMap { m =>
      m.pictures.find(_.keyframe).collect {
        case kf if kf.size > 8 =>
          VideoMeta(id, if (m.programStream) "mpeg-ps" else "mpeg-es",
            "mpeg1", m.width.toLong, m.height.toLong,
            m.pictures.size.toLong, m.keyframeCount.toLong,
            m.durationMs,
            m.pictures.map(_.size).sum,
            kf.size, (m.es((kf.esOffset + 8).toInt) & 0xff).toLong,
            0L)
      }
    }

  /** One deterministic MPEG-1 video per id (same registry placement
    * rule as [[syntheticVideoMedia]]). Closed form per id: n = 2 +
    * (id%8) pictures whose slice is 8 + (30 + ((id + 3i) % 45)) bytes
    * of payload byte (id*5+i)%251, I-frame (with GOP header) every 3rd
    * picture, 16*(1+id%25) x 16*(1+id%15), 25 fps (frame-rate code 3).
    * Even ids wrap the elementary stream in MPEG-1 program-stream
    * packs with small PES packets (64 + (id%5)*40 bytes), so pictures
    * SPAN packets and the fixture exercises reassembly.
    */
  def syntheticMpegMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (2 + id % 8).toInt
      val bytes = Mpeg.write(Mpeg.BuildSpec(
        width = (16 * (1 + id % 25)).toInt,
        height = (16 * (1 + id % 15)).toInt,
        payloadSizes = (1 to n).map(i => (30 + ((id + 3 * i) % 45)).toInt),
        gopEvery = 3,
        fill = i => ((id * 5 + i) % 251).toByte,
        programStream = id % 2 == 0,
        pesChunk = (64 + (id % 5) * 40).toInt))
      (id, bytes, "video/mpeg")
    }).toDF("doc_id", "bytes", "mime")
  }

  /** AVI rows in the same [[VideoMeta]] shape: brand = "avi", codec =
    * the vids stream's handler fourcc, samples = movi frame chunks,
    * keyframes from idx1 (all-sync without one), duration from avih's
    * frame interval × total frames. No edit lists: media_time = 0.
    */
  private def aviVideoMeta(id: Long, b: Array[Byte]): Option[VideoMeta] =
    completeAviVideo(b).flatMap { m =>
      m.frames.find(_.keyframe).collect {
        case kf if kf.size > 0 =>
          VideoMeta(id, "avi", m.codec,
            m.width.toLong, m.height.toLong,
            m.frames.size.toLong, m.keyframeCount.toLong,
            m.durationMs,
            m.frames.map(_.size).sum,
            kf.size, (b(kf.offset.toInt) & 0xff).toLong,
            0L)
      }
    }

  /** One deterministic single-vids-stream AVI per id (same registry
    * placement rule as [[syntheticVideoMedia]]). Closed form per id:
    * n = 3 + (id%8) MJPG frame chunks of 45+((id+5*i)%60) bytes filled
    * with (id*11+i)%251, keyframes every 3rd frame via idx1 (ids
    * divisible by 7 omit idx1 → all frames sync), 8*(1+id%30) x
    * 8*(1+id%20), 40 ms per frame.
    */
  def syntheticAviMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (3 + id % 8).toInt
      val bytes = Avi.write(Avi.BuildSpec(
        width = (8 * (1 + id % 30)).toInt,
        height = (8 * (1 + id % 20)).toInt,
        frameSizes = (1 to n).map(i => (45 + ((id + 5 * i) % 60)).toInt),
        keyEvery = 3,
        fill = i => ((id * 11 + i) % 251).toByte,
        withIndex = id % 7 != 0))
      (id, bytes, "video/x-msvideo")
    }).toDF("doc_id", "bytes", "mime")
  }

  private def mp4VideoMeta(id: Long, b: Array[Byte]): Option[VideoMeta] =
    Mp4.parse(b).flatMap { m =>
      m.videoTracks.headOption
        .filter(_.samples.forall(s =>
          s.offset >= 0 && s.offset + s.size <= b.length))
        .flatMap { t =>
          t.samples.find(_.sync).collect {
            case kf if kf.size > 0 =>
              VideoMeta(id, m.majorBrand, t.codec,
                t.width.toLong, t.height.toLong,
                t.sampleCount.toLong, t.keyframeCount.toLong,
                m.durationMs,
                t.samples.map(_.size).sum,
                kf.size, (b(kf.offset.toInt) & 0xff).toLong,
                t.mediaTimeOffset)
          }
        }
    }

  /** WebM rows fill the same [[VideoMeta]] shape: brand = EBML DocType,
    * codec = the track's CodecID, samples = the video track's
    * SimpleBlocks, keyframes = blocks with the keyframe flag; the kf1
    * witness reads the first keyframe's payload byte back at the
    * block-declared window. WebM has no edit list: media_time = 0.
    */
  private def webmVideoMeta(id: Long, b: Array[Byte]): Option[VideoMeta] =
    completeWebmVideo(b).flatMap { case (m, t, bs) =>
      bs.find(_.keyframe).collect {
        case kf if kf.size > 0 =>
          VideoMeta(id, m.docType, t.codec,
            t.width.toLong, t.height.toLong,
            bs.size.toLong, bs.count(_.keyframe).toLong,
            m.durationMs,
            bs.map(_.size).sum,
            kf.size, (b(kf.offset.toInt) & 0xff).toLong,
            0L)
      }
    }

  /** One deterministic single-video-track WebM per id (same registry
    * placement rule as [[syntheticVideoMedia]]). Closed form per id:
    * n = 2 + (id%9) SimpleBlocks, block i (1-based) is 30+((id+2*i)%40)
    * bytes of byte value (id*7+i)%251, keyframe every 4th block, 4
    * blocks per cluster, 32*(1+id%10) x 32*(1+id%6), V_VP9, 40 ms per
    * block at the 1 ms default timecode scale; ids divisible by 2 use
    * the unknown-size (streaming) Segment form.
    */
  def syntheticWebmMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (2 + id % 9).toInt
      val bytes = Webm.write(Webm.BuildSpec(
        width = (32 * (1 + id % 10)).toInt,
        height = (32 * (1 + id % 6)).toInt,
        blockSizes = (1 to n).map(i => (30 + ((id + 2 * i) % 40)).toInt),
        keyEvery = 4,
        fill = i => ((id * 7 + i) % 251).toByte,
        unknownSizeSegment = id % 2 == 0))
      (id, bytes, "video/webm")
    }).toDF("doc_id", "bytes", "mime")
  }

  /** Partition-wise feature extraction over the media column: real
    * ImageIO decode (PNG/JPEG/BMP/GIF) with stub fallback for payloads
    * no JDK codec accepts.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE for decoders that need it
        it.map { case (id, bytes) =>
          val (w, h, f) = decodeImage(bytes).getOrElse(decodeStub(bytes))
          MediaFeature(id, w, h, bytes.length.toLong, f)
        }
      }
  }

  final case class AudioMetaRow(
      doc_id: Long, format: String, codec: String, sample_rate: Long,
      channels: Long, duration_ms: Long, n_units: Long)

  /** Container-metadata stage for audio media: real header parses for
    * every pure-byte public format ([[Audio]] — MP3 frame walk, FLAC
    * STREAMINFO, OGG pages with Vorbis/Opus id headers, WAV RIFF).
    * Rows no parser accepts are dropped (they belong to other
    * modalities). `n_units` is the format's natural count (MP3 frames,
    * WAV/FLAC samples per channel, OGG pages).
    */
  def audioMeta(media: DataFrame): Dataset[AudioMetaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        Audio.parse(b).map(i => AudioMetaRow(id, i.format, i.codec,
          i.sampleRate, i.channels, i.durationMs, i.units))
      })
  }

  /** One deterministic audio file per id, format by id%5 — the FULL
    * reference audio extension set (main.py:70-72: ogg wav mp3 flac
    * m4a), every format real-parsed (same registry placement rule as
    * [[syntheticVideoMedia]]). The q_audio_meta oracle recomputes
    * every field in SQL:
    *  - 0 -> MP3: 3+(id%6) MPEG-1 L3 frames at 44100 Hz, bitrate index
    *    9+(id%3) (128/160/192 kbps), mono iff id%10==0; id%20==0 ids
    *    are VBR (per-frame bitrates + Xing header frame — the parsed
    *    count must come from the Xing field, not the frame walk);
    *  - 1 -> WAV: 16-bit PCM, 8000*(1+id%3) Hz, mono iff id%10==1,
    *    200+(id%50) samples per channel;
    *  - 2 -> FLAC: 32000+(id%3)*8000 Hz, 1+((id/5)%2) channels,
    *    5000+(id*13)%20000 total samples;
    *  - 3 -> OGG: Opus iff id%10==8 (48 kHz, pre-skip 312, granule
    *    312+960*k) else Vorbis (44100 Hz, granule 4410*k), k=2+(id%4),
    *    stereo, 2+(id%3) data pages after the BOS id page;
    *  - 4 -> M4A: ISO-BMFF soun track, 4+(id%7) samples of 1024 ticks
    *    at timescale 44100 (the AAC frame convention), mono iff
    *    id%10==4, mp4a entry.
    */
  def syntheticAudioMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val bytes = (id % 5) match {
        case 0 if id % 20 == 0 =>
          // VBR: per-frame bitrate indices + a leading Xing header
          // frame carrying the authoritative audio-frame count. The
          // oracle needs no branch — duration/units equal the SAME
          // 3+(id%6) frame count — but only the Xing parse produces
          // it (the walked count would include the header frame)
          Audio.writeMp3Vbr(
            bitrateIdxs = (1 to (3 + id % 6).toInt)
              .map(j => (9 + (id + j) % 5).toInt),
            rateIdx = 0, mono = true, // id%10==0 ids are the mono ids
            fill = i => ((id + i) % 251).toByte)
        case 0 =>
          // ids ending in 5 carry a leading ID3v2 tag (47 padding
          // bytes; ids ending in 15 mod 20 also carry the v2.4
          // FOOTER, +10 bytes the syncsafe size excludes) — parsed
          // fields are identical, so the oracle needs no branch; the
          // tag-skip paths just get real coverage
          Audio.writeMp3(frames = (3 + id % 6).toInt,
            bitrateIdx = (9 + id % 3).toInt, rateIdx = 0,
            mono = id % 10 == 0, fill = i => ((id + i) % 251).toByte,
            id3Bytes = if (id % 10 == 5) 47 else 0,
            id3Footer = id % 20 == 15)
        case 1 =>
          Audio.writeWav(rate = (8000 * (1 + id % 3)).toInt,
            channels = if (id % 10 == 1) 1 else 2,
            nPerChannel = (200 + id % 50).toInt,
            fill = i => ((id + i) % 251).toByte)
        case 2 =>
          Audio.writeFlac(rate = (32000 + (id % 3) * 8000).toInt,
            channels = (1 + (id / 5) % 2).toInt,
            totalSamples = 5000 + (id * 13) % 20000,
            fill = i => ((id + i) % 251).toByte)
        case 3 =>
          val k = 2 + id % 4
          val opus = id % 10 == 8
          Audio.writeOgg(opus = opus, channels = 2,
            rate = if (opus) 48000L else 44100L,
            preSkip = 312,
            finalGranule = if (opus) 312 + 960 * k else 4410 * k,
            dataPages = (2 + id % 3).toInt,
            fill = i => ((id + i) % 251).toByte)
        case _ =>
          val n = (4 + id % 7).toInt
          Mp4.write(Mp4.BuildSpec(
            width = 0, height = 0,
            sampleSizes = (1 to n).map(i => (40 + ((id + i) % 32)).toInt),
            syncEvery = 1, includeStss = false,
            timescale = 44100L, sampleDelta = 1024L,
            audio = true, channels = if (id % 10 == 4) 1 else 2,
            fill = i => ((id + i) % 251).toByte))
      }
      val mime = (id % 5) match {
        case 0 => "audio/mpeg"
        case 1 => "audio/wav"
        case 2 => "audio/flac"
        case 3 => "audio/ogg"
        case _ => "audio/mp4"
      }
      (id, bytes, mime)
    }).toDF("doc_id", "bytes", "mime")
  }

  /** Partition-wise audio feature extraction: real WAV/PCM parse; rows
    * whose payload is not WAV are dropped (they belong to other
    * modalities).
    */
  def extractAudioFeatures(media: DataFrame): Dataset[AudioFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWav(bytes).map { case (rate, ch, n, meanAbs) =>
          AudioFeature(id, rate, ch, n, meanAbs)
        }
      })
  }

  // ------------------------------------------------------------------
  // cross-format triage — the FIRST operator a mixed crawled-blob
  // corpus runs: sniff every payload's container magic (disjointness
  // pinned by ParserFuzzSpec) and route it to the right parser
  // ------------------------------------------------------------------

  /** One unified row per blob: detected format, pixel dims where the
    * format has them (0 otherwise), and the format's natural unit
    * count (video samples, audio units, archive members, PDF pages,
    * GIF frames, 1 for a still image). A sniffed-but-unparseable
    * payload reports "unknown" — triage is TOTAL: every blob gets a
    * verdict, no row is dropped and no task dies.
    */
  final case class TriageRow(doc_id: Long, format: String,
      n_bytes: Long, width: Long, height: Long, n_units: Long)

  /** Classify + parse one payload. Sniff order puts ISO-BMFF first
    * (it self-dispatches video vs m4a-audio by track handler) and the
    * generic audio sniff last (MP3's 11-bit sync is the weakest
    * magic); RIFF splits on the format tag (AVI vs WAVE).
    */
  def describeAny(id: Long, b: Array[Byte]): TriageRow = {
    def row(fmt: String, w: Long, h: Long, units: Long) =
      TriageRow(id, fmt, b.length.toLong, w, h, units)
    def unknown = row("unknown", 0, 0, 0)
    // brand-first: AVIF/HEIC carry ftyp (Mp4 sniffs them) but hold a
    // meta image, not a movie — route before the movie parser
    if (Avif.isAvif(b)) Avif.parse(b).map(m =>
      row("avif", m.width.toLong, m.height.toLong,
        math.max(1, m.items).toLong)).getOrElse(unknown)
    else if (Mp4.isMp4(b)) Mp4.parse(b).map { m =>
      m.tracks.find(_.handler == "vide") match {
        case Some(t) =>
          row("mp4", t.width.toLong, t.height.toLong, t.sampleCount.toLong)
        case None => m.tracks.find(_.handler == "soun") match {
          case Some(t) => row("audio", 0, 0, t.sampleCount.toLong)
          case None => unknown
        }
      }
    }.getOrElse(unknown)
    else if (Webm.isWebm(b)) Webm.parse(b).map { m =>
      m.videoTrack match {
        case Some(t) => row("webm", t.width.toLong, t.height.toLong,
          m.videoBlocks.size.toLong)
        case None => row("webm", 0, 0, m.blocks.size.toLong)
      }
    }.getOrElse(unknown)
    else if (Avi.isAvi(b)) Avi.parse(b).map(m =>
      row("avi", m.width.toLong, m.height.toLong, m.frames.size.toLong))
      .getOrElse(unknown)
    else if (Mpeg.isMpeg(b)) Mpeg.parse(b).map(m =>
      row(if (m.programStream) "mpeg-ps" else "mpeg-es",
        m.width.toLong, m.height.toLong, m.pictures.size.toLong))
      .getOrElse(unknown)
    else if (Gif.isGif(b)) Gif.parse(b).map(m =>
      row("gif", m.width.toLong, m.height.toLong, m.frames.size.toLong))
      .getOrElse(unknown)
    else if (Png.isPng(b)) Png.parse(b).map(m =>
      row("png", m.width.toLong, m.height.toLong, m.frames.toLong))
      .getOrElse(unknown)
    else if (WebP.isWebP(b)) WebP.parse(b).map(m =>
      row("webp", m.width.toLong, m.height.toLong, m.frames.toLong))
      .getOrElse(unknown)
    else if (Exif.isJpeg(b)) Exif.parse(b).map(m =>
      row("jpeg", m.width.toLong, m.height.toLong, 1L)).getOrElse(unknown)
    else if (Tiff.isTiff(b)) Tiff.parse(b).map(m =>
      row("tiff", m.width.toLong, m.height.toLong, m.pages.toLong))
      .getOrElse(unknown)
    else if (Tar.isTar(b)) {
      val ms = Tar.members(b)
      if (ms.nonEmpty) row("tar", 0, 0, ms.size.toLong) else unknown
    }
    else if (Zip.isZip(b)) {
      val ms = Zip.members(b)
      if (ms.nonEmpty) row("zip", 0, 0, ms.size.toLong) else unknown
    }
    else if (Pdf.isPdf(b)) Pdf.meta(b).map(m =>
      row("pdf", 0, 0, m.nPages)).getOrElse(unknown)
    else Audio.parse(b).map(i => row("audio", 0, 0, i.units))
      .getOrElse(unknown)
  }

  /** The triage stage: one TOTAL row per payload, zero shuffle. */
  def mediaTriage(media: DataFrame): Dataset[TriageRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => describeAny(id, b) })
  }

  /** A mixed thirteen-way corpus (format by id%13, arithmetic mirrored
    * by the q_media_triage oracle): mp4 / webm / avi / gif / wav /
    * tar / zip / pdf / exif-jpeg / plain text (= "unknown") / png
    * (APNG-framed by (id/13)%3) / webp (layout rotated vp8 → vp8l →
    * animated vp8x by (id/13)%3) / multi-page tiff (pages by
    * 1+(id/13)%3, packbits on odd (id/13)). Each family uses its real
    * muxer twin with COMPACT closed forms — this is the fixture for
    * the dispatch semantics; per-family depth is oracled by the
    * format queries.
    */
  def syntheticMixedCorpus(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      (id, mixedBlobFor(id), "application/octet-stream")
    }).toDF("doc_id", "bytes", "mime")
  }

  /** One mixed-corpus blob in closed form — the per-id builder behind
    * [[syntheticMixedCorpus]], shared with the warc-framed media
    * fixture (graft.wat.WatFixture.ensureDocMediaWarcs) so the
    * index-driven ranged fetch and the in-memory corpus carry
    * byte-identical payloads.
    */
  def mixedBlobFor(id: Long): Array[Byte] = {
    val w = (16 * (1 + id % 5)).toInt
    val h = (16 * (1 + id % 4)).toInt
    (id % 13) match {
        case 0 => Mp4.write(Mp4.BuildSpec(w, h,
          (1 to (2 + id % 3).toInt).map(j => 30 + j), syncEvery = 2))
        case 1 => Webm.write(Webm.BuildSpec(w, h,
          (1 to (2 + id % 4).toInt).map(j => 25 + j), keyEvery = 2))
        case 2 => Avi.write(Avi.BuildSpec(w, h,
          (1 to (2 + id % 5).toInt).map(j => 35 + j), keyEvery = 2))
        case 3 => Gif.write(Gif.BuildSpec(w, h,
          (1 to (1 + id % 3).toInt).map(j => 18 + j),
          (1 to (1 + id % 3).toInt).map(_ => 5), loop = 1))
        case 4 => Audio.writeWav(8000 * (1 + id % 3).toInt, channels = 1,
          (100 + id % 50).toInt)
        case 5 => Tar.write((1 to (1 + id % 4).toInt).map(j =>
          (s"$id-$j.bin", Array.fill(20 + j)(1.toByte))))
        case 6 => Zip.write((1 to (1 + id % 3).toInt).map(j =>
          (s"$id-$j.bin", Array.fill(20 + j)(2.toByte), false)))
        case 7 => Pdf.write(Pdf.BuildSpec(
          (1 to (1 + id % 2).toInt).map(p => Seq(s"pg $p of $id")),
          title = s"Doc $id", author = "a", producer = "p",
          created = "D:20240101000000", seed = id, flate = true))
        case 8 => Exif.insertApp1(encodedHostImage("jpg", w, h),
          orientation = 1, make = "MakeX", model = "ModelX",
          dateTimeOriginal = "2024:01:01 00:00:00",
          latArcsec = 0L, lonArcsec = 0L, hasGps = false)
        // the inner rotations step by id/13: within a residue class
        // mod m, id % k is CONSTANT whenever k divides m — stepping by
        // the quotient is the documented fixture rule
        case 10 => Png.write(w, h, seed = id,
          frames = (1 + (id / 13) % 3).toInt)
        case 11 => WebP.write(
          ((id / 13) % 3) match {
            case 0 => "vp8"; case 1 => "vp8l"; case _ => "vp8x"
          },
          w, h, seed = id,
          frames = if ((id / 13) % 3 == 2) (2 + (id / 13) % 2).toInt else 1)
        case 12 => Tiff.write(w, h, pages = (1 + (id / 13) % 3).toInt,
          packbits = (id / 13) % 2 == 1, seed = id)
        case _ => s"plain text payload $id".getBytes("UTF-8")
    }
  }

  /** Dedicated image-probe stage over png/webp/avif payloads: one row
    * per blob with the layout kind the triage row cannot carry —
    * (doc_id, format, kind, width, height, frames: APNG/ANMF frame
    * count, or the iinf item count for avif/heic). Per-row header
    * parse in mapPartitions, zero shuffle.
    */
  def imageProbe(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        if (Png.isPng(b)) Png.parse(b).map(m =>
          (id, "png", if (m.frames > 1) "apng" else "static",
            m.width.toLong, m.height.toLong, m.frames.toLong))
        else if (WebP.isWebP(b)) WebP.parse(b).map(m =>
          (id, "webp", m.kind, m.width.toLong, m.height.toLong,
            m.frames.toLong))
        else if (Avif.isAvif(b)) Avif.parse(b).map(m =>
          (id, "avif", m.brand, m.width.toLong, m.height.toLong,
            m.items.toLong))
        else if (Tiff.isTiff(b)) Tiff.parse(b).map(m =>
          (id, "tiff", m.compressionName, m.width.toLong,
            m.height.toLong, m.pages.toLong))
        else None
      }).toDF("doc_id", "format", "kind", "width", "height", "frames")
  }

  /** One image per id for q_image_probe, format by id % 4 — 0: PNG
    * (APNG acTL by (id/4)%3), 1: WebP (vp8 / vp8l / animated vp8x by
    * (id/4)%3), 2: AVIF/HEIC (brand by (id/4)%2, iinf items
    * 1+(id/4)%3, a 4-tile grid when (id/4)%2=1 — the canvas-ispe
    * pick), 3: TIFF (pages 1+(id/4)%3, packbits on odd (id/4), the
    * `kind` column carrying the compression name). Inner rotations
    * step by id/4: within a residue class mod 4, id % 4 (and id % 2)
    * is constant. Dims by the shared 16-multiples.
    */
  def syntheticImageMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val w = (16 * (1 + id % 5)).toInt
      val h = (16 * (1 + id % 4)).toInt
      val r = id / 4
      val (bytes, mime) = (id % 4) match {
        case 0 =>
          (Png.write(w, h, seed = id, frames = (1 + r % 3).toInt),
            "image/png")
        case 1 =>
          (WebP.write(
            (r % 3) match { case 0 => "vp8"; case 1 => "vp8l"; case _ => "vp8x" },
            w, h, seed = id,
            frames = if (r % 3 == 2) (2 + r % 2).toInt else 1),
            "image/webp")
        case 2 =>
          (Avif.write(if (r % 2 == 0) "avif" else "heic", w, h,
            items = (1 + r % 3).toInt, tiles = if (r % 2 == 1) 4 else 0,
            seed = id), "image/avif")
        case _ =>
          (Tiff.write(w, h, pages = (1 + r % 3).toInt,
            packbits = r % 2 == 1, seed = id), "image/tiff")
      }
      (id, bytes, mime)
    }).toDF("doc_id", "bytes", "mime")
  }
}
