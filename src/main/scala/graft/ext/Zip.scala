package graft.ext

import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Dataset}

/** ZIP shard ingest — the other common sample-shard container beside
  * WebDataset tar (APPNOTE.TXT ZIP format, stored + DEFLATE members).
  *
  * Same executor contract as every pure-byte parser here ([[Tar]],
  * [[Mp4]], ...): hostile/truncated input fails CLOSED (empty member
  * list / None), never throws, and every declared window and count is
  * bounded by the payload extent before allocation — one crafted shard
  * in a crawled corpus must not kill a task or balloon its heap.
  *
  * Scope: single-disk ZIP, classic AND ZIP64 (APPNOTE 4.5): when the
  * EOCD carries 0xFFFF/0xFFFFFFFF escape markers the reader walks the
  * ZIP64 EOCD locator → ZIP64 EOCD record for the real 8-byte
  * count/size/offset, and central entries with masked fields resolve
  * them from the 0x0001 extra field — at 100 TB, >4 GiB shards and
  * >65535-member archives are routine. Spanned (multi-disk) archives
  * still fail closed.
  *
  * The decode path is REAL: DEFLATE members inflate through
  * `java.util.zip.Inflater` and every extraction is CRC32-verified, so
  * the q_zip_* oracles witness a working decompressor, not a window
  * copy.
  */
object Zip {

  /** One central-directory entry: name, method (0 = stored,
    * 8 = deflate), exact compressed payload window (offset is the
    * payload start AFTER the local header), sizes, and the recorded
    * CRC32 of the uncompressed bytes.
    */
  final case class Member(name: String, method: Int, offset: Long,
      compSize: Long, uncompSize: Long, crc: Long)

  private final val LocalSig = 0x04034b50
  private final val CentralSig = 0x02014b50
  private final val EocdSig = 0x06054b50
  private final val Eocd64Sig = 0x06064b50
  private final val Eocd64LocSig = 0x07064b50
  private final val Mask16 = 0xffff
  private final val Mask32 = 0xffffffffL

  /** DEFLATE's worst-case expansion bound is ~1032:1; anything past it
    * in a declared uncompressed size is hostile. Absolute ceiling
    * mirrors Mp4's hostile-count cap: no single member of a sample
    * shard legitimately inflates past 64 MiB here.
    */
  private final val MaxInflateRatio = 1032L
  private final val MaxMemberBytes = 1L << 26

  def isZip(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && u32(bytes, 0) == LocalSig

  // --- little-endian readers (bounds are the CALLER's obligation) ---
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def u64(b: Array[Byte], off: Int): Long =
    u32(b, off) | (u32(b, off + 4) << 32)

  /** Locate the End-Of-Central-Directory record: scan backward over
    * the at-most-65535-byte trailing comment. Returns its offset.
    */
  private def findEocd(bytes: Array[Byte]): Option[Int] = {
    val last = bytes.length - 22
    val first = math.max(0, last - 65535)
    var p = last
    while (p >= first) {
      if (u32(bytes, p) == EocdSig &&
          // the comment must exactly fill the remaining tail — a
          // signature embedded in member DATA fails this check
          p + 22 + u16(bytes, p + 20) == bytes.length)
        return Some(p)
      p -= 1
    }
    None
  }

  /** Resolve a central entry's masked (0xFFFFFFFF) size/offset fields
    * from its ZIP64 extra field (header id 0x0001): only the masked
    * fields are present, in uncompressed-size, compressed-size,
    * local-offset order (APPNOTE 4.5.3). None when a mask has no
    * backing value — that is malformed, not "probably zero".
    */
  private def zip64Resolve(bytes: Array[Byte], extraOff: Int,
      extraLen: Int, comp0: Long, uncomp0: Long, off0: Long)
      : Option[(Long, Long, Long)] = {
    if (comp0 != Mask32 && uncomp0 != Mask32 && off0 != Mask32)
      return Some((comp0, uncomp0, off0))
    var p = extraOff
    val end = extraOff + extraLen
    while (p + 4 <= end) {
      val id = u16(bytes, p)
      val sz = u16(bytes, p + 2)
      if (p + 4 + sz > end) return None
      if (id == 0x0001) {
        var q = p + 4
        val fend = p + 4 + sz
        def next8(): Option[Long] =
          if (q + 8 <= fend) { val v = u64(bytes, q); q += 8; Some(v) }
          else None
        val uncomp =
          if (uncomp0 == Mask32) next8().getOrElse(return None) else uncomp0
        val comp =
          if (comp0 == Mask32) next8().getOrElse(return None) else comp0
        val off =
          if (off0 == Mask32) next8().getOrElse(return None) else off0
        if (uncomp < 0 || comp < 0 || off < 0) return None
        return Some((comp, uncomp, off))
      }
      p += 4 + sz
    }
    None
  }

  /** Walk the central directory, classic or ZIP64. Empty on anything
    * malformed: missing or inconsistent EOCD, a broken ZIP64 locator
    * chain, multi-disk markers, out-of-extent windows, or a central
    * entry whose local header disagrees.
    */
  def members(bytes: Array[Byte]): Seq[Member] = {
    val eocd = findEocd(bytes).getOrElse(return Seq.empty)
    var nTotal: Long = u16(bytes, eocd + 10)
    var cdSize = u32(bytes, eocd + 12)
    var cdOff = u32(bytes, eocd + 16)
    // spanned archives fail closed in both formats
    if (u16(bytes, eocd + 4) != 0 || u16(bytes, eocd + 6) != 0 ||
        u16(bytes, eocd + 8) != nTotal) return Seq.empty
    if (nTotal == Mask16 || cdSize == Mask32 || cdOff == Mask32) {
      // ZIP64: the locator sits immediately before the EOCD and names
      // the EOCD64 record holding the real 8-byte values
      val loc = eocd - 20
      if (loc < 0 || u32(bytes, loc) != Eocd64LocSig) return Seq.empty
      if (u32(bytes, loc + 4) != 0 || u32(bytes, loc + 16) != 1)
        return Seq.empty // EOCD64 disk + total disks: single-disk only
      val e64 = u64(bytes, loc + 8)
      if (e64 < 0 || e64 + 56 > loc) return Seq.empty
      val r = e64.toInt
      if (u32(bytes, r) != Eocd64Sig) return Seq.empty
      if (u64(bytes, r + 4) < 44) return Seq.empty // record size floor
      if (u32(bytes, r + 16) != 0 || u32(bytes, r + 20) != 0)
        return Seq.empty // this disk / cd start disk
      val nDisk = u64(bytes, r + 24)
      nTotal = u64(bytes, r + 32)
      cdSize = u64(bytes, r + 40)
      cdOff = u64(bytes, r + 48)
      if (nDisk != nTotal || nTotal < 0 || cdSize < 0 || cdOff < 0 ||
          cdOff + cdSize != e64) return Seq.empty
    } else if (cdOff + cdSize != eocd.toLong) return Seq.empty
    // 46 bytes is the minimal central header: the declared count
    // cannot exceed what the directory extent can physically hold
    if (nTotal > cdSize / 46) return Seq.empty
    val cdEnd = cdOff + cdSize // == eocd classic, == EOCD64 offset zip64

    val out = Vector.newBuilder[Member]
    var p = cdOff.toInt
    var i = 0L
    while (i < nTotal) {
      if (p + 46 > cdEnd || u32(bytes, p) != CentralSig) return Seq.empty
      val method = u16(bytes, p + 10)
      val crc = u32(bytes, p + 16)
      val comp0 = u32(bytes, p + 20)
      val uncomp0 = u32(bytes, p + 24)
      val nameLen = u16(bytes, p + 28)
      val extraLen = u16(bytes, p + 30)
      val commentLen = u16(bytes, p + 32)
      val localOff0 = u32(bytes, p + 42)
      if (p + 46 + nameLen + extraLen > cdEnd) return Seq.empty
      val name = new String(bytes, p + 46, nameLen, "UTF-8")
      val (comp, uncomp, localOff) = zip64Resolve(bytes, p + 46 + nameLen,
        extraLen, comp0, uncomp0, localOff0).getOrElse(return Seq.empty)
      // local header re-read: ITS name/extra lengths place the payload
      // (they may legally differ from the central copy)
      if (localOff + 30 > bytes.length ||
          u32(bytes, localOff.toInt) != LocalSig) return Seq.empty
      val lp = localOff.toInt
      val payload = localOff + 30 + u16(bytes, lp + 26) + u16(bytes, lp + 28)
      if (payload + comp > bytes.length) return Seq.empty
      if (method != 0 && method != 8) return Seq.empty
      if (method == 0 && comp != uncomp) return Seq.empty
      if (uncomp > MaxMemberBytes ||
          (method == 8 && uncomp > comp * MaxInflateRatio + 64))
        return Seq.empty
      out += Member(name, method, payload, comp, uncomp, crc)
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    out.result()
  }

  /** Extract one member: copy (stored) or inflate (deflate), then
    * CRC32-verify. None on any mismatch — a short inflate, trailing
    * garbage, or a CRC miss all fail closed.
    */
  def extract(bytes: Array[Byte], m: Member): Option[Array[Byte]] = {
    if (m.offset < 0 || m.offset + m.compSize > bytes.length ||
        m.uncompSize > MaxMemberBytes) return None
    val out =
      if (m.method == 0) {
        if (m.compSize != m.uncompSize) return None
        java.util.Arrays.copyOfRange(bytes, m.offset.toInt,
          (m.offset + m.compSize).toInt)
      } else if (m.method == 8) {
        val inf = new Inflater(true) // raw deflate: zip has no zlib wrapper
        try {
          inf.setInput(bytes, m.offset.toInt, m.compSize.toInt)
          val buf = new Array[Byte](m.uncompSize.toInt)
          val scratch = new Array[Byte](1)
          var done = 0
          var spin = 0
          // run to stream end even past a full buf: a stream LONGER
          // than the declared size must be seen (and failed), and an
          // empty member's end-of-stream marker still needs one call
          while (!inf.finished() && spin < (1 << 20)) {
            spin += 1
            val n =
              try {
                if (done < buf.length) inf.inflate(buf, done, buf.length - done)
                else inf.inflate(scratch, 0, 1)
              } catch { case _: java.util.zip.DataFormatException => return None }
            if (done >= buf.length && n > 0) return None // over-long stream
            done += n
            if (n == 0 && !inf.finished() && inf.needsInput())
              return None // truncated stream
          }
          if (done != buf.length || !inf.finished()) return None
          buf
        } finally inf.end() // native zlib state — not GC-collected
      } else return None
    val crc = new CRC32
    crc.update(out)
    if (crc.getValue != m.crc) None else Some(out)
  }

  /** Deterministic single-disk ZIP writer (the muxer twin): fixed DOS
    * timestamp, no comments — byte-stable for a given entry list
    * modulo the JVM's zlib output, which the PARSER (not the oracle)
    * consumes back. With `zip64` the central entries mask all three
    * size/offset fields into 0x0001 extra fields and the tail is the
    * ZIP64 EOCD record + locator + marker EOCD — the layout any >4 GiB
    * or >65535-member shard carries (here exercised at small sizes:
    * the FORMAT is what the reader must walk, not the magnitude).
    */
  def write(entries: Seq[(String, Array[Byte], Boolean)],
      zip64: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      bos.write((v & 0xff).toInt); bos.write(((v >> 8) & 0xff).toInt)
      bos.write(((v >> 16) & 0xff).toInt); bos.write(((v >> 24) & 0xff).toInt)
    }
    def w64(v: Long): Unit = { w32(v & Mask32); w32((v >>> 32) & Mask32) }
    val central = entries.map { case (name, data, deflate) =>
      val crc = new CRC32
      crc.update(data)
      val packed =
        if (deflate) {
          val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
          try {
            d.setInput(data)
            d.finish()
            val buf = new Array[Byte](math.max(64, data.length * 2 + 64))
            val tmp = new java.io.ByteArrayOutputStream()
            while (!d.finished()) tmp.write(buf, 0, d.deflate(buf))
            tmp.toByteArray
          } finally d.end()
        } else data
      val nameB = name.getBytes("UTF-8")
      val localOff = bos.size().toLong
      w32(LocalSig); w16(20); w16(0); w16(if (deflate) 8 else 0)
      w16(0); w16(0x21) // fixed DOS time 00:00:00, date 1980-01-01
      w32(crc.getValue); w32(packed.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      bos.write(nameB); bos.write(packed)
      (nameB, deflate, crc.getValue, packed.length.toLong,
        data.length.toLong, localOff)
    }
    val cdOff = bos.size().toLong
    central.foreach { case (nameB, deflate, crc, csize, usize, off) =>
      w32(CentralSig); w16(if (zip64) 45 else 20); w16(if (zip64) 45 else 20)
      w16(0); w16(if (deflate) 8 else 0)
      w16(0); w16(0x21); w32(crc)
      if (zip64) {
        w32(Mask32); w32(Mask32) // sizes live in the 0x0001 extra
        w16(nameB.length); w16(4 + 24); w16(0); w16(0); w16(0)
        w32(0L); w32(Mask32)
        bos.write(nameB)
        w16(0x0001); w16(24); w64(usize); w64(csize); w64(off)
      } else {
        w32(csize); w32(usize)
        w16(nameB.length); w16(0); w16(0); w16(0); w16(0); w32(0L); w32(off)
        bos.write(nameB)
      }
    }
    val cdSize = bos.size().toLong - cdOff
    if (zip64) {
      val e64 = bos.size().toLong
      w32(Eocd64Sig); w64(44L); w16(45); w16(45); w32(0L); w32(0L)
      w64(entries.size.toLong); w64(entries.size.toLong)
      w64(cdSize); w64(cdOff)
      w32(Eocd64LocSig); w32(0L); w64(e64); w32(1L)
      w32(EocdSig); w16(0); w16(0); w16(Mask16); w16(Mask16)
      w32(Mask32); w32(Mask32); w16(0)
    } else {
      w32(EocdSig); w16(0); w16(0); w16(entries.size); w16(entries.size)
      w32(cdSize); w32(cdOff); w16(0)
    }
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Spark stages (same shape as Multimodal's: parse in mapPartitions —
  // the only correct home for byte-level work — zero shuffle, member
  // windows cut where the shard bytes already live)
  // ------------------------------------------------------------------

  /** Explode ZIP shard payloads into a member table with the decode
    * VERIFIED per member: (doc_id, name, method, byte_len, first_byte,
    * last_byte, crc_ok). byte_len/first/last describe the UNCOMPRESSED
    * payload — getting them right on a deflate member requires a
    * working inflate, and crc_ok witnesses the checksum pass.
    */
  def zipArchiveMembers(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        members(b).iterator.map { m =>
          val data = extract(b, m)
          val methodName = if (m.method == 8) "deflate" else "stored"
          data match {
            case Some(d) if d.nonEmpty =>
              (id, m.name, methodName, d.length.toLong,
                (d(0) & 0xff).toLong, (d(d.length - 1) & 0xff).toLong, true)
            case Some(_) =>
              (id, m.name, methodName, 0L, -1L, -1L, true)
            case None =>
              (id, m.name, methodName, -1L, -1L, -1L, false)
          }
        }
      }).toDF("doc_id", "name", "method", "byte_len", "first_byte",
        "last_byte", "crc_ok")
  }

  /** WebDataset-convention member explode for ZIP sample shards:
    * (doc_id, member, key, ext, bytes) with key/ext split at the
    * basename's FIRST dot — the same convention as
    * `Multimodal.webdatasetMembers`, so one sample's modalities share
    * a key and the SAME downstream sample-table join serves both shard
    * formats. Extraction is inflate+CRC as everywhere; failed members
    * contribute nothing.
    */
  def zipWdsMembers(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        members(b).iterator.flatMap { m =>
          extract(b, m).map { data =>
            val base = m.name.substring(m.name.lastIndexOf('/') + 1)
            val dot = base.indexOf('.')
            val (key, ext) =
              if (dot < 0) (base, "")
              else (base.substring(0, dot), base.substring(dot + 1))
            (id, m.name, key, ext, data)
          }
        }
      }).toDF("doc_id", "member", "key", "ext", "bytes")
  }

  /** Text members back out of ZIP shards: every `.txt` member inflated,
    * CRC-verified, and UTF-8 decoded — (doc_id, text). The lossless
    * round-trip (document text → deflated shard → back) is the q_zip_text
    * oracle's whole claim.
    */
  def zipTexts(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "bytes").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        members(b).iterator
          .filter(_.name.endsWith(".txt"))
          .flatMap(m => extract(b, m))
          .map(d => (id, new String(d, "UTF-8")))
      }).toDF("doc_id", "text")
  }

  /** One deterministic ZIP shard per id: n = 2 + (id%4) members,
    * member j named `id/partj.txt|.bin` (odd j txt, even j bin) of
    * 30 + ((id*j)%70) bytes whose k-th byte is (id + 2j + k) % 251,
    * DEFLATE'd when (id+j)%2 == 0 else stored — the q_zip_archive
    * oracle recomputes all of it (the non-constant fill makes a
    * copied-window shortcut fail on last_byte). Ids ≡ 0 (mod 3) pack
    * the SAME members in the ZIP64 container layout (EOCD64 record +
    * locator, masked central fields) — identical member rows, so one
    * oracle covers both formats and a reader that fails closed on
    * ZIP64 markers drops a third of the corpus and hash-mismatches.
    */
  def syntheticZipMedia(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val n = (2 + id % 4).toInt
      val entries = (1 to n).map { j =>
        val len = (30 + (id * j) % 70).toInt
        val data = Array.tabulate(len)(k => ((id + 2 * j + k) % 251).toByte)
        val ext = if (j % 2 == 1) ".txt" else ".bin"
        (s"$id/part$j$ext", data, (id + j) % 2 == 0)
      }
      (id, write(entries, zip64 = id % 3 == 0), "application/zip")
    }).toDF("doc_id", "bytes", "mime")
  }

  /** One DEFLATE'd `<id>.txt` member per document holding its actual
    * UTF-8 text — the corpus-in-zip-shards ingest shape q_zip_text
    * round-trips.
    */
  def syntheticZipTextMedia(docs: Dataset[(java.lang.Long, String)])
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (boxed, text) =>
      val id = boxed.longValue()
      (id, write(Seq((s"$id.txt", text.getBytes("UTF-8"), true))),
        "application/zip")
    }).toDF("doc_id", "bytes", "mime")
  }
}
