package graft.sources

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.wat.WatFixture

/** Structured Streaming over the wat source: the load() glob is
  * relisted per micro-batch, each archive is ingested exactly once, and
  * later-sorting arrivals ride the next batch.
  */
class WatStreamSpec extends AnyFunSuite with SparkTestBase {

  private val metaPerArchive = WatFixture.records.size - 1 // warcinfo excluded

  test("streaming wat source ingests newly landed archives exactly once") {
    val dir = Files.createTempDirectory("watstream").toFile
    WatFixture.write(new File(dir, "a1.warc.wat.gz").getAbsolutePath)
    val q = spark.readStream.format("wat")
      .load(s"${dir.getAbsolutePath}/*.warc.wat.gz")
      .writeStream.outputMode("append").format("memory")
      .queryName("watstream").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from watstream").count() ==
        metaPerArchive.toLong)

      // a new archive lands (sorts after a1) → exactly its rows appear
      WatFixture.write(new File(dir, "a2.warc.wat.gz").getAbsolutePath)
      q.processAllAvailable()
      val perPath = spark
        .sql("select wat_path, count(*) AS n from watstream group by wat_path")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perPath.size == 2)
      assert(perPath.values.forall(_ == metaPerArchive.toLong)) // no dups

      // an idle relist adds nothing
      q.processAllAvailable()
      assert(spark.sql("select * from watstream").count() ==
        2L * metaPerArchive)
    } finally q.stop()
  }

  test("max_files_per_trigger bounds each micro-batch") {
    val dir = Files.createTempDirectory("watstream3").toFile
    (1 to 3).foreach(i =>
      WatFixture.write(new File(dir, s"c$i.warc.wat.gz").getAbsolutePath))
    val q = spark.readStream.format("wat")
      .option("max_files_per_trigger", 1)
      .load(s"${dir.getAbsolutePath}/*.warc.wat.gz")
      .writeStream.outputMode("append").format("memory")
      .queryName("watadmit").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from watadmit").count() ==
        3L * metaPerArchive) // backlog fully drained...
      val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
      assert(batchSizes.length == 3) // ...in 3 bounded batches
      assert(batchSizes.forall(_ == metaPerArchive.toLong))
    } finally q.stop()
  }

  test("continuous extraction == batch extraction, appended per batch") {
    val dir = Files.createTempDirectory("watstream2").toFile
    val a1 = WatFixture.write(new File(dir, "b1.warc.wat.gz").getAbsolutePath)
    val out = new File(dir, "out").getAbsolutePath
    val chk = new File(dir, "chk").getAbsolutePath
    val q = graft.wat.WatExtract
      .extractStream(spark, Seq(s"${dir.getAbsolutePath}/*.warc.wat.gz"), "image")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk).start()
    try {
      q.processAllAvailable()
      val streamed = spark.read.parquet(out)
        .collect().map(_.toString).sorted
      val batch = graft.wat.WatExtract.fromPaths(spark, Seq(a1), "image")
        .toDF().collect().map(_.toString).sorted
      assert(streamed.sameElements(batch))

      // second archive lands → only its links append
      val a2 = WatFixture.write(new File(dir, "b2.warc.wat.gz").getAbsolutePath)
      q.processAllAvailable()
      val both = graft.wat.WatExtract.fromPaths(spark, Seq(a1, a2), "image")
        .toDF().collect().map(_.toString).sorted
      val streamed2 = spark.read.parquet(out)
        .collect().map(_.toString).sorted
      assert(streamed2.sameElements(both))
    } finally q.stop()
  }

  test("manifest-notification intake: new manifests drive extraction, no prefix relist") {
    val dir = Files.createTempDirectory("watmanifest").toFile
    val archives = new File(dir, "archives"); archives.mkdirs()
    val manifests = new File(dir, "manifests"); manifests.mkdirs()
    val a1 = WatFixture.write(new File(archives, "m1.warc.wat.gz").getAbsolutePath)
    val a2 = WatFixture.write(new File(archives, "m2.warc.wat.gz").getAbsolutePath)
    // manifest 1 announces both archives; comments/blanks are ignored
    java.nio.file.Files.write(new File(manifests, "wat.paths.1").toPath,
      s"# crawl batch 1\n$a1\n\n$a2\n".getBytes("UTF-8"))
    val out = new File(dir, "out").getAbsolutePath
    val chk = new File(dir, "chk").getAbsolutePath
    val q = graft.wat.WatExtract
      .extractStreamFromManifests(spark,
        s"${manifests.getAbsolutePath}/wat.paths.*", "image")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", chk).start()
    try {
      q.processAllAvailable()
      val batch = graft.wat.WatExtract.fromPaths(spark, Seq(a1, a2), "image")
        .toDF().collect().map(_.toString).sorted
      assert(spark.read.parquet(out).collect().map(_.toString).sorted
        .sameElements(batch))

      // a new manifest lands announcing a third archive → only it appends
      val a3 = WatFixture.write(new File(archives, "m3.warc.wat.gz").getAbsolutePath)
      java.nio.file.Files.write(new File(manifests, "wat.paths.2").toPath,
        s"$a3\n".getBytes("UTF-8"))
      q.processAllAvailable()
      val all = graft.wat.WatExtract.fromPaths(spark, Seq(a1, a2, a3), "image")
        .toDF().collect().map(_.toString).sorted
      assert(spark.read.parquet(out).collect().map(_.toString).sorted
        .sameElements(all))

      // idle trigger adds nothing (the manifest log, not a re-listing,
      // decides what is new)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == all.length.toLong)
    } finally q.stop()
  }
}
