package graft.sources

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.wat.WatFixture

/** Structured Streaming over the warc source: same relist-sort-prefix
  * contract as the wat stream (each archive exactly once, new arrivals
  * next batch, bounded admission), plus the stateless extraction chain
  * (scanHtml + relational tail) running as a live intake.
  */
class WarcStreamSpec extends AnyFunSuite with SparkTestBase {

  private val pagesPerArchive = 10L

  private def writeWarc(dir: File, name: String, seed: Long): String =
    WatFixture.syntheticWarc(new File(dir, name).getAbsolutePath,
      nRecords = pagesPerArchive.toInt, linksPerRecord = 5, seed = seed)

  test("streaming warc source ingests newly landed archives exactly once") {
    val dir = Files.createTempDirectory("warcstream").toFile
    writeWarc(dir, "a1.warc.gz", 11L)
    val q = spark.readStream.format("warc")
      .load(s"${dir.getAbsolutePath}/*.warc.gz")
      .writeStream.outputMode("append").format("memory")
      .queryName("warcstream").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from warcstream").count() ==
        pagesPerArchive)

      writeWarc(dir, "a2.warc.gz", 12L)
      q.processAllAvailable()
      val perPath = spark
        .sql("select warc_path, count(*) AS n from warcstream group by warc_path")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perPath.size == 2)
      assert(perPath.values.forall(_ == pagesPerArchive)) // no dups

      q.processAllAvailable() // idle relist adds nothing
      assert(spark.sql("select * from warcstream").count() ==
        2L * pagesPerArchive)
    } finally q.stop()
  }

  test("max_files_per_trigger bounds each warc micro-batch") {
    val dir = Files.createTempDirectory("warcstream3").toFile
    (1 to 3).foreach(i => writeWarc(dir, s"c$i.warc.gz", 20L + i))
    val q = spark.readStream.format("warc")
      .option("max_files_per_trigger", 1)
      .load(s"${dir.getAbsolutePath}/*.warc.gz")
      .writeStream.outputMode("append").format("memory")
      .queryName("warcadmit").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from warcadmit").count() ==
        3L * pagesPerArchive)
      val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchSizes.length == 3)
      assert(batchSizes.forall(_ == pagesPerArchive))
    } finally q.stop()
  }

  test("streaming extraction (scanHtml + relational tail) matches the " +
      "batch path per archive") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("warcstream2").toFile
    val w = writeWarc(dir, "b1.warc.gz", 31L)
    val stream = spark.readStream.format("warc")
      .load(s"${dir.getAbsolutePath}/*.warc.gz")
      .select("warc_path", "page_url", "html")
      .as[(String, String, String)]
      .mapPartitions(_.map { case (p, uri, html) =>
        val (base, links) = graft.wat.WarcHtml.scanHtml(html)
        graft.wat.WarcHtml.PageLinks(
          p.substring(p.lastIndexOf('/') + 1), uri, base.orNull, links)
      }).toDF()
    val extracted = graft.wat.WatExtract
      .extractLinks(stream, "image_only").toDF()
    val q = extracted.writeStream.outputMode("append").format("memory")
      .queryName("warcextract").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("select * from warcextract")
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getString(2), r.getString(4))).sorted.toSeq
      val batch = graft.wat.WarcExtract.fromPaths(spark, Seq(w), "image_only")
        .collect().map(d => (d.uid, d.url, d.alt, d.page_url))
        .sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }
}
