package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.wat.{WarcExtract, WatFixture}

/** DSv2 `warc` source: schema/rows, planning-time path pruning,
  * column pruning (html decode skipped), max_tasks batching, and
  * extraction parity between the DSv2 path and the flatMap path.
  */
class WarcDataSourceSpec extends AnyFunSuite with SparkTestBase {

  private lazy val warcs: Seq[String] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-dsv2")
    (0 until 4).map { i =>
      WatFixture.syntheticWarc(dir.resolve(s"w$i.warc.gz").toString,
        nRecords = 25, linksPerRecord = 6, seed = 500L + i)
    }
  }

  test("schema and row count: one row per text/html response record") {
    val df = spark.read.format("warc").load(warcs: _*)
    assert(df.schema.fieldNames.toSeq ==
      Seq("warc_path", "page_url", "html"))
    // 25 responses per archive; the warcinfo record contributes nothing
    assert(df.count() == 4L * 25)
    val row = df.orderBy("page_url").head()
    assert(row.getString(1).startsWith("https://site"))
    assert(row.getString(2).contains("<html>"))
  }

  test("warc_path predicates prune partitions at planning time") {
    val one = spark.read.format("warc").load(warcs: _*)
      .where(org.apache.spark.sql.functions.col("warc_path")
        .endsWith("w2.warc.gz"))
    assert(one.select("warc_path").distinct().count() == 1L)
    // the pruned scan plans exactly ONE input partition (the other
    // three archives are never fetched)
    assert(one.rdd.getNumPartitions == 1)
  }

  test("column pruning: dropping html still counts pages; ReadSchema " +
      "shows the pruned projection") {
    val counts = spark.read.format("warc").load(warcs: _*)
      .groupBy("warc_path").count()
    assert(counts.count() == 4L)
    val plan = counts.queryExecution.executedPlan.toString
    assert(!plan.contains("html#") || !plan.contains("ReadSchema") ||
      !plan.split("ReadSchema")(1).takeWhile(_ != '\n').contains("html"),
      s"html column must be pruned from the scan:\n$plan")
  }

  test("max_tasks batches archives into bounded partitions") {
    val batched = spark.read.format("warc").option("max_tasks", "2")
      .load(warcs: _*)
    assert(batched.rdd.getNumPartitions == 2)
    assert(batched.count() == 4L * 25) // batching loses nothing
  }

  test("fromDsv2 extraction equals the flatMap path, every doc type") {
    for (docType <- graft.model.DocumentType.All) {
      val a = WarcExtract.fromPaths(spark, warcs, docType)
        .collect().map(d => (d.uid, d.url, d.alt, d.cc_filename,
          d.page_url)).sorted.toSeq
      val b = WarcExtract.fromDsv2(spark, warcs, docType)
        .collect().map(d => (d.uid, d.url, d.alt, d.cc_filename,
          d.page_url)).sorted.toSeq
      assert(a.nonEmpty, s"$docType: empty extraction")
      assert(b == a, s"$docType: DSv2/flatMap extraction diverged")
    }
  }
  test("doc-warc fixture: the documents table round-trips through WARC " +
      "framing — boilerplate metrics equal the direct-html path") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val docWarcs = WatFixture.ensureDocWarcs(spark, sfDir)
    val pages = spark.read.format("warc").load(docWarcs: _*)
      .select(col("page_url"), col("html"))
    assert(pages.count() == 500L) // every non-null doc becomes a page
    def rows(df: org.apache.spark.sql.DataFrame, idFromUrl: Boolean) = {
      val keyed =
        if (idFromUrl) df.withColumn("doc_id",
          regexp_extract(col("page_url"), "doc(\\d+)", 1).cast("long"))
        else df
      graft.ext.Boilerplate
        .extractMainContent(keyed.select("doc_id", "html"),
          "doc_id", "html")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4))).sorted.toSeq
    }
    val viaWarc = rows(pages, idFromUrl = true)
    val direct = rows(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .where(col("doc_id").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, graft.queries.ExtQueries.bpHtmlFor(id, text))
        }.toDF("doc_id", "html"), idFromUrl = false)
    assert(viaWarc.nonEmpty && viaWarc == direct,
      "WARC transport changed the boilerplate extraction")
  }
  test("stream_threshold_bytes: archives above it decode as a stream; " +
      "rows identical to whole-file mode") {
    val whole = spark.read.format("warc").load(warcs: _*)
      .collect().map(_.toSeq).sortBy(_.toString)
    // threshold 1 byte: EVERY archive takes the streaming-decode path
    val streamed = spark.read.format("warc")
      .option("stream_threshold_bytes", "1")
      .load(warcs: _*)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(streamed.nonEmpty && streamed.toSeq == whole.toSeq)
    // and the flatMap path honors it too
    val a = WarcExtract.fromPaths(spark, warcs, "image_only")
      .collect().map(_.toString).sorted.toSeq
    val errs = spark.sparkContext.longAccumulator("warc-stream-test")
    val b = graft.wat.WatExtract.extractLinks(
      WarcExtract.pages(spark, warcs, errs, streamThresholdBytes = 1L),
      "image_only").collect().map(_.toString).sorted.toSeq
    assert(b == a && errs.value == 0L)
  }
}
