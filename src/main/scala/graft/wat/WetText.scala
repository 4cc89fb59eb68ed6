package graft.wat

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WET (extracted-text) sidecar reader — the THIRD Common Crawl
  * archive format beside WAT metadata and raw WARC: one
  * `WARC-Type: conversion` record per page holding the crawler's own
  * plain-text extraction. A text pipeline that trusts CC's extraction
  * reads WET and skips HTML parsing entirely, so the engine exposes
  * it as a first-class source with the SAME task shape as the other
  * two (one task per archive, gzip-member framing via
  * [[WatReader.archiveRecords]], corrupt frames end the file).
  *
  * Payload decode: the WET spec says UTF-8, but real shards carry
  * BOMs and the odd mislabeled page — [[graft.ext.Charsets.decode]]
  * is total and handles both.
  */
object WetText {

  /** One extracted page: archive basename, target URI, text. */
  final case class WetDoc(cc_filename: String, page_url: String,
      wet_text: String)

  /** All conversion records of one WET file. Non-conversion records
    * (warcinfo headers CC writes first) are skipped; a record without
    * a target URI is dropped (nothing to key the page by).
    */
  def docsOf(path: String, conf: Configuration,
      onCorrupt: Exception => Unit,
      inMemoryLimitBytes: Long = Long.MaxValue): ClosingIterator[WetDoc] = {
    val ccName = path.substring(path.lastIndexOf('/') + 1)
    val recs = WatReader.archiveRecords(path, conf, onCorrupt,
      inMemoryLimitBytes)
    new ClosingIterator(
      recs.filter(_.warcType.equalsIgnoreCase("conversion"))
        .flatMap { r =>
          r.headers.get("warc-target-uri").map { uri =>
            WetDoc(ccName, uri, graft.ext.Charsets.decode(r.payload)._1)
          }
        },
      () => recs.close())
  }

  /** One partition per WET path (the same parallelization unit as the
    * WAT/WARC sources) → (cc_filename, page_url, wet_text) rows.
    */
  def docs(spark: SparkSession, paths: Seq[String]): DataFrame =
    docs(spark, paths,
      spark.sparkContext.longAccumulator("graft.wet.read_errors"))

  def docs(spark: SparkSession, paths: Seq[String],
      readErrors: org.apache.spark.util.LongAccumulator,
      streamThresholdBytes: Long = Long.MaxValue): DataFrame = {
    import spark.implicits._
    ArchiveTasks.perArchive(spark, paths, readErrors,
      streamThresholdBytes)(docsOf(_, _, _, _)).toDF()
  }
}
