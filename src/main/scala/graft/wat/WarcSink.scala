package graft.wat

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC OUTPUT — the re-packaging sink. A curation pipeline's end
  * product is often not parquet but a filtered sub-corpus in the
  * archive format the rest of the ecosystem consumes (WARC `response`
  * records); the reference stops at parquet, real pipelines re-emit.
  *
  * Layout matches CC's own publication conventions so the OUTPUT is a
  * first-class input to everything upstream in this engine: a leading
  * `warcinfo` record per shard (the form real CC shards and the
  * engine's own fixtures carry), then one `.warc.gz` shard per task,
  * EVERY record its own gzip member (re-indexable: [[CcIndex
  * .memberSpans]] frames it, `buildIndex`/`buildIndexFromRecords` over
  * the written shards yields locator rows, and the ranged fetch can
  * pull single records back out), each record carrying a
  * `WARC-Payload-Digest` header (sha1-base32 of the HTTP entity) so
  * fetch-side verification works on the round trip.
  *
  * Two record shapes share the writer core: [[writePages]] for the
  * HTML-page corpus (string bodies, 200/text-html envelope) and
  * [[writeRecords]] for the MIXED corpus (binary bodies with each
  * record's own status + content type — composes directly with
  * [[CcIndex.fetchHttpRecords]] output, so a filtered crawl re-packs
  * losslessly whatever formats it carries).
  *
  * 100 TB posture: pure per-partition imperative write — no shuffle is
  * introduced (callers choose the shard count with their own
  * `repartition`), bytes stream member-by-member (no whole-shard
  * buffer), and the commit is write-to-temp + atomic rename keyed by
  * partition id, so a retried or speculative task republishes the same
  * shard instead of duplicating records.
  */
object WarcSink {

  /** Deterministic WARC record id: real ids are `urn:uuid` values, and
    * a random UUID would make the written bytes run-dependent — derive
    * the uuid form from md5 over the given seed bytes instead (stable
    * across retries, which is also what makes the shard republish
    * idempotent byte-for-byte).
    */
  private[wat] def recordId(seed: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(seed)
    val hex = d.map("%02x".format(_)).mkString
    s"urn:uuid:${hex.substring(0, 8)}-${hex.substring(8, 12)}-" +
      s"${hex.substring(12, 16)}-${hex.substring(16, 20)}-" +
      hex.substring(20, 32)
  }

  private[wat] def recordId(url: String): String =
    recordId(url.getBytes(UTF_8))

  /** The HTTP reason phrase for the re-emitted status line — a small
    * fixed table (anything else gets the bare generic), chosen for
    * determinism, not completeness: WARC consumers key on the numeric
    * code.
    */
  private[wat] def reasonPhrase(status: Int): String = status match {
    case 200 => "OK"
    case 301 => "Moved Permanently"
    case 302 => "Found"
    case 304 => "Not Modified"
    case 403 => "Forbidden"
    case 404 => "Not Found"
    case 500 => "Internal Server Error"
    case 503 => "Service Unavailable"
    case _   => "Status"
  }

  /** Assemble one complete WARC record block (headers + payload +
    * record terminator) and gzip it as its own member.
    */
  private def gzipRecord(head: Array[Byte], payload: Array[Byte])
      : Array[Byte] = {
    val rec = new ByteArrayOutputStream(head.length + payload.length + 4)
    rec.write(head); rec.write(payload)
    rec.write("\r\n\r\n".getBytes(UTF_8))
    val bos = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rec.toByteArray); gz.close()
    bos.toByteArray
  }

  /** The shard's leading `warcinfo` record (application/warc-fields
    * body) — what real CC shards open with and what the engine's own
    * fixtures write; record id derived from the shard filename so the
    * member stays deterministic per shard.
    */
  private[wat] def warcinfoMember(filename: String, warcDate: String)
      : Array[Byte] = {
    val body = ("software: graft-warcsink\r\n" +
      "format: WARC File Format 1.0\r\n").getBytes(UTF_8)
    val head = (s"WARC/1.0\r\n" +
      s"WARC-Type: warcinfo\r\n" +
      s"WARC-Record-ID: <${recordId(s"warcinfo:$filename")}>\r\n" +
      s"WARC-Date: $warcDate\r\n" +
      s"WARC-Filename: $filename\r\n" +
      s"Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    gzipRecord(head, body)
  }

  /** One record → a complete single-member gzip WARC `response` record
    * (re-assembled HTTP envelope + WARC headers incl. the payload
    * digest) with an arbitrary BINARY body and the record's own
    * status/content type. The record id seeds on url + body sha1 so
    * two captures of the SAME url with different bytes (a crawl's
    * duplicate-url reality) keep distinct ids while staying
    * deterministic.
    */
  private[wat] def responseMemberRaw(url: String, status: Int,
      contentType: String, body: Array[Byte],
      warcDate: String): Array[Byte] = {
    val ct = if (contentType == null || contentType.isEmpty)
      "application/octet-stream" else contentType
    val http = (s"HTTP/1.1 $status ${reasonPhrase(status)}\r\n" +
      s"Content-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    val payload = new Array[Byte](http.length + body.length)
    System.arraycopy(http, 0, payload, 0, http.length)
    System.arraycopy(body, 0, payload, http.length, body.length)
    val digest = CcIndex.payloadDigest(payload)
    val idSeed = new ByteArrayOutputStream(url.length + 21)
    idSeed.write(url.getBytes(UTF_8)); idSeed.write(0)
    idSeed.write(
      java.security.MessageDigest.getInstance("SHA-1").digest(body))
    val head = (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: <${recordId(idSeed.toByteArray)}>\r\n" +
      s"WARC-Date: $warcDate\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Payload-Digest: sha1:$digest\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8)
    gzipRecord(head, payload)
  }

  /** One page → a complete single-member gzip WARC `response` record
    * (HTTP envelope + WARC headers incl. the payload digest). Record
    * id stays seeded on the url alone — the historical page-corpus
    * contract (one page per url), kept so existing shards republish
    * byte-identically.
    */
  private[wat] def responseMember(url: String, html: String,
      warcDate: String): Array[Byte] = {
    val body = html.getBytes(UTF_8)
    val http = (s"HTTP/1.1 200 OK\r\n" +
      s"Content-Type: text/html; charset=UTF-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
    val payload = new Array[Byte](http.length + body.length)
    System.arraycopy(http, 0, payload, 0, http.length)
    System.arraycopy(body, 0, payload, http.length, body.length)
    val digest = CcIndex.payloadDigest(payload)
    val head = (s"WARC/1.0\r\n" +
      s"WARC-Type: response\r\n" +
      s"WARC-Record-ID: <${recordId(url)}>\r\n" +
      s"WARC-Date: $warcDate\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      s"WARC-Payload-Digest: sha1:$digest\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(UTF_8)
    gzipRecord(head, payload)
  }

  /** The shared per-partition shard writer: warcinfo lead + one gzip
    * member per row, write-to-temp + atomic rename keyed by partition
    * id (a retried task rewrites the SAME deterministic bytes, so
    * last-publish-wins is exactly-once in content). Returns the
    * manifest rows `(path, records, bytes)` for non-empty partitions.
    */
  /** `member` receives (row, warcDate, shardName) — the name lets a
    * record reference its own shard where the format calls for it.
    */
  private[wat] def writeShards[A](rows: org.apache.spark.sql.Dataset[A],
      dir: String, prefix: String, warcDate: String,
      suffix: String = ".warc.gz")(
      member: (A, String, String) => Array[Byte]): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    rows.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val ctx = org.apache.spark.TaskContext.get()
        val pid = if (ctx == null) 0 else ctx.partitionId()
        val attempt = if (ctx == null) 0L else ctx.taskAttemptId()
        val conf = confBc.value.value
        val name = f"$prefix-$pid%05d$suffix"
        val outPath = new Path(dir, name)
        val tmpPath = new Path(dir, f".$prefix-$pid%05d-$attempt.tmp")
        val fs = outPath.getFileSystem(conf)
        val out = fs.create(tmpPath, true)
        var n = 0L
        var bytes = 0L
        try {
          val info = warcinfoMember(name, warcDate)
          out.write(info)
          bytes += info.length
          it.foreach { row =>
            val m = member(row, warcDate, name)
            out.write(m)
            n += 1
            bytes += m.length
          }
        } finally out.close()
        // atomic publish: delete-then-rename keyed by partition id —
        // a retried task rewrites the SAME deterministic bytes, so
        // last-publish-wins is exactly-once in content
        fs.delete(outPath, false)
        if (!fs.rename(tmpPath, outPath))
          throw new java.io.IOException(
            s"could not publish WARC shard $outPath")
        Iterator.single((outPath.toString, n, bytes))
      }
    }.toDF("path", "records", "bytes")
  }

  /** Write `(page_url, html)` rows as WARC response shards under
    * `dir` — one shard per input partition, named `$prefix-NNNNN
    * .warc.gz`, each led by a `warcinfo` record. Returns the manifest
    * frame `(path, records, bytes)` (one row per non-empty shard —
    * `records` counts response records, not the warcinfo lead; the
    * caller's action drives the write). `warcDate` is caller-supplied
    * so the written bytes stay deterministic (a wall-clock stamp would
    * defeat golden checks and byte-level retry idempotence).
    */
  def writePages(pages: DataFrame, dir: String,
      prefix: String = "pages",
      warcDate: String = "2024-01-01T00:00:00Z"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    writeShards(pages
      .select(col("page_url").cast("string"), col("html").cast("string"))
      .as[(String, String)], dir, prefix, warcDate) {
      (row, date, _) =>
        responseMember(if (row._1 == null) "" else row._1,
          if (row._2 == null) "" else row._2, date)
    }
  }

  /** Write the MIXED corpus: `(page_url, fetch_status, content_type,
    * body)` rows — binary bodies re-emitted under each record's own
    * HTTP status and content type (the column shape [[CcIndex
    * .fetchHttpRecords]] produces, so index → ranged fetch → re-pack
    * composes without a rename). Same shard layout, warcinfo lead,
    * manifest contract, and deterministic-byte idempotence as
    * [[writePages]].
    */
  def writeRecords(records: DataFrame, dir: String,
      prefix: String = "records",
      warcDate: String = "2024-01-01T00:00:00Z"): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    writeShards(records
      .select(col("page_url").cast("string"),
        col("fetch_status").cast("int"),
        col("content_type").cast("string"),
        col("body").cast("binary"))
      .as[(String, Int, String, Array[Byte])], dir, prefix, warcDate) {
      (row, date, _) =>
        responseMemberRaw(if (row._1 == null) "" else row._1, row._2,
          row._3,
          if (row._4 == null) Array.emptyByteArray else row._4, date)
    }
  }
}
