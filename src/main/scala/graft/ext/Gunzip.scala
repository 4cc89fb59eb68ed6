package graft.ext

/** Capped, fail-closed gunzip shared by the discovery parsers
  * ([[Robots.parseSitemapBytes]], [[Feeds.parseFeedBytes]]): sniffs
  * the 1f 8b magic, inflates with a hard output ceiling (a
  * decompression bomb or a wrapped/negative allocation fails closed
  * to None, never a throw), passes non-gzip bytes through unchanged.
  */
private[ext] object Gunzip {

  /** Some(bytes) — decompressed if gzip, verbatim otherwise; None on
    * truncation, corruption, or output past `cap`.
    */
  def capped(b: Array[Byte], cap: Int): Option[Array[Byte]] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b)
      return Some(b)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        // Long math then clamp: b.length * 4 overflows Int past
        // 512 MiB input and a negative hint throws — fail closed by
        // construction instead
        val hint = math.min(b.length.toLong * 4, cap.toLong).toInt
        val out = new java.io.ByteArrayOutputStream(math.max(64, hint))
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) {
          if (out.size() + n > cap) return None
          out.write(buf, 0, n)
          n = in.read(buf)
        }
        Some(out.toByteArray)
      } finally in.close()
    } catch { case _: java.io.IOException => None }
  }
}
