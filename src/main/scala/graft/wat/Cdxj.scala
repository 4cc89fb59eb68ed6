package graft.wat

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** CDXJ — the TEXT form of the web-archive index (pywb's CDXJ spec;
  * CC publishes the same records as `cc-index/collections/.../indexes/
  * cdx-*.gz`): one line per capture,
  *
  *   `<SURT key> <14-digit timestamp> <JSON block>`
  *
  * with the JSON carrying url / mime / status / digest / length /
  * offset / filename as STRINGS. SURT ordering makes the file
  * range-seekable by domain; the JSON block carries exactly the
  * columns the ranged fetch ([[CcIndex.fetchHtmlPages]]) needs — a
  * CDXJ shard set IS a cc-index without a SQL engine in front.
  */
object Cdxj {

  final case class CdxjRow(surtKey: String, timestamp: String,
      url: String, mime: String, status: Int, digest: String,
      filename: String, offset: Long, length: Long)

  /** Shared parser — `ObjectMapper` construction is heavyweight and
    * `readTree` is thread-safe, so one instance serves every line of a
    * ~300M-line monthly index instead of being rebuilt per line.
    */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** ASCII '0'-'9' only: `Char.isDigit` admits Unicode digit classes
    * (Arabic-Indic etc.) that `toLong` would then throw on.
    */
  private def asciiDigits(s: String): Boolean =
    s.nonEmpty && s.forall(c => c >= '0' && c <= '9')

  /** One line → Some(row); malformed lines (bad field count, broken
    * JSON, non-numeric or Long-overflowing offset/length/status) →
    * None — a corrupt line in a 300M-line index must drop, not kill
    * the shard. The numeric conversions sit INSIDE the catch: a
    * 20+-digit all-ASCII-digit offset overflows Long and throws
    * NumberFormatException, which must be a dropped line too.
    */
  def parseLine(line: String): Option[CdxjRow] = {
    val s1 = line.indexOf(' ')
    if (s1 <= 0) return None
    val s2 = line.indexOf(' ', s1 + 1)
    if (s2 <= s1 + 1) return None
    val key = line.substring(0, s1)
    val ts = line.substring(s1 + 1, s2)
    if (ts.length != 14 || !asciiDigits(ts)) return None
    val json = line.substring(s2 + 1)
    try {
      val node = mapper.readTree(json)
      if (node == null || !node.isObject) return None
      def str(f: String): String = {
        val v = node.get(f)
        if (v == null || !v.isTextual) "" else v.asText()
      }
      val url = str("url")
      if (url.isEmpty) return None
      val offset = str("offset")
      val length = str("length")
      val status = str("status")
      if (!asciiDigits(offset) || !asciiDigits(length)) return None
      Some(CdxjRow(key, ts, url, str("mime"),
        if (asciiDigits(status)) status.toInt else 0,
        str("digest"), str("filename"), offset.toLong, length.toLong))
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => None
      case _: NumberFormatException => None
    }
  }

  /** CDXJ shards (gzip or plain text, one task per shard like every
    * archive source) → the cc-index frame shape
    * ([[CcIndex.fetchHtmlPages]]-ready: `warc_filename` /
    * `warc_record_offset` / `warc_record_length` plus the relational
    * filter columns). Line-level error tolerance via [[parseLine]];
    * shard-level read failures count into `readErrors`.
    */
  def indexFrame(spark: SparkSession, paths: Seq[String]): DataFrame =
    indexFrame(spark, paths,
      spark.sparkContext.longAccumulator("graft.cdxj.read_errors"))

  def indexFrame(spark: SparkSession, paths: Seq[String],
      readErrors: org.apache.spark.util.LongAccumulator): DataFrame = {
    import spark.implicits._
    ArchiveTasks.perArchive[
        (String, String, String, String, Int, String, String, Long, Long)](
        spark, paths, readErrors, Long.MaxValue) { (path, conf, onCorrupt, _) =>
      WatReader.fetchAllBytes(path, conf) match {
        case None =>
          onCorrupt(new java.io.IOException(s"fetch failed: $path"))
          ClosingIterator.empty
        case Some(bytes) =>
          val in = WatReader.decompressed(
            new java.io.ByteArrayInputStream(bytes))
          val reader = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, "UTF-8"), 1 << 16)
          val lines = Iterator.continually(reader.readLine())
            .takeWhile(_ != null)
          new ClosingIterator(
            lines.flatMap(l => parseLine(l).iterator).map(r =>
              (r.surtKey, r.timestamp, r.url, r.mime, r.status,
                r.digest, r.filename, r.offset, r.length)),
            () => reader.close())
      }
    }.toDF("url_surtkey", "fetch_time", "url", "content_mime_type",
      "fetch_status", "content_digest", "warc_filename",
      "warc_record_offset", "warc_record_length")
  }

  /** Render one capture as a CDXJ line (writer twin). */
  def formatLine(url: String, timestamp: String, mime: String,
      status: Int, digest: String, filename: String, offset: Long,
      length: Long): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    graft.ext.Surt.surtKey(url) + " " + timestamp + " " +
      s"""{"url": "${esc(url)}", "mime": "${esc(mime)}", """ +
      s""""status": "$status", "digest": "${esc(digest)}", """ +
      s""""length": "$length", "offset": "$offset", """ +
      s""""filename": "${esc(filename)}"}"""
  }
}
