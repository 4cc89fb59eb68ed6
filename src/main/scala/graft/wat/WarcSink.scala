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
  * first-class input to everything upstream in this engine:
  * one `.warc.gz` shard per task, EVERY record its own gzip member
  * (re-indexable: [[CcIndex.memberSpans]] frames it, `buildIndex` over
  * the written shards yields locator rows, and the ranged fetch can
  * pull single records back out), each record carrying a
  * `WARC-Payload-Digest` header (sha1-base32 of the HTTP entity) so
  * fetch-side verification works on the round trip.
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
    * the uuid form from md5(url) instead (stable across retries, which
    * is also what makes the shard republish idempotent byte-for-byte).
    */
  private[wat] def recordId(url: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(url.getBytes(UTF_8))
    val hex = d.map("%02x".format(_)).mkString
    s"urn:uuid:${hex.substring(0, 8)}-${hex.substring(8, 12)}-" +
      s"${hex.substring(12, 16)}-${hex.substring(16, 20)}-" +
      hex.substring(20, 32)
  }

  /** One page → a complete single-member gzip WARC `response` record
    * (HTTP envelope + WARC headers incl. the payload digest).
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
    val rec = new ByteArrayOutputStream(
      head.length + payload.length + 4)
    rec.write(head); rec.write(payload)
    rec.write("\r\n\r\n".getBytes(UTF_8))
    val bos = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(rec.toByteArray); gz.close()
    bos.toByteArray
  }

  /** Write `(page_url, html)` rows as WARC response shards under
    * `dir` — one shard per input partition, named `$prefix-NNNNN
    * .warc.gz`. Returns the manifest frame `(path, records, bytes)`
    * (one row per non-empty shard; the caller's action drives the
    * write). `warcDate` is caller-supplied so the written bytes stay
    * deterministic (a wall-clock stamp would defeat golden checks and
    * byte-level retry idempotence).
    */
  def writePages(pages: DataFrame, dir: String,
      prefix: String = "pages",
      warcDate: String = "2024-01-01T00:00:00Z"): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    pages
      .select(col("page_url").cast("string"), col("html").cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val ctx = org.apache.spark.TaskContext.get()
          val pid = if (ctx == null) 0 else ctx.partitionId()
          val attempt = if (ctx == null) 0L else ctx.taskAttemptId()
          val conf = confBc.value.value
          val outPath = new Path(dir, f"$prefix-$pid%05d.warc.gz")
          val tmpPath = new Path(dir, f".$prefix-$pid%05d-$attempt.tmp")
          val fs = outPath.getFileSystem(conf)
          val out = fs.create(tmpPath, true)
          var n = 0L
          var bytes = 0L
          try {
            it.foreach { case (url, html) =>
              val member = responseMember(
                if (url == null) "" else url,
                if (html == null) "" else html, warcDate)
              out.write(member)
              n += 1
              bytes += member.length
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
      }
      .toDF("path", "records", "bytes")
  }
}
