package graft.wat

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The WARC output sink: lossless round trip through the warc source,
  * CC-conventional framing (one gzip member per record), deterministic
  * bytes (retry idempotence), and the full circle — the engine's own
  * output is indexable and ranged-fetchable.
  */
class WarcSinkSpec extends AnyFunSuite with SparkTestBase {

  private def tmpDir(tag: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d
  }

  test("write → read back is lossless; shards are member-per-record") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.test/1", "<html><body>alpha &amp; beta</body></html>"),
      ("https://a.test/2", "<html><body>second page</body></html>"),
      ("https://b.test/x", "<html><body>third</body></html>"))
      .toDF("page_url", "html")
    val dir = tmpDir("warc-sink")
    val manifest = WarcSink.writePages(pages.repartition(2),
      dir.getAbsolutePath).collect()
    assert(manifest.map(_.getAs[Long]("records")).sum == 3L)
    val written = manifest.map(_.getAs[String]("path")).sorted
    // every record is its own gzip member (the re-indexable framing)
    for (p <- written) {
      val bytes = java.nio.file.Files.readAllBytes(
        new java.io.File(new java.net.URI(
          if (p.startsWith("file:")) p else "file://" + p)).toPath)
      val spans = CcIndex.memberSpans(bytes)
      assert(spans.nonEmpty)
      val inf = new java.util.zip.Inflater(true)
      try for ((o, l) <- spans) {
        val r = CcIndex.memberRecord(bytes, o.toInt, l.toInt, inf).get
        assert(r.warcType == "response")
        assert(r.headers.contains("warc-payload-digest"))
        assert(r.headers.contains("warc-record-id"))
      } finally inf.end()
    }
    // round trip through the DSv2 source
    val back = spark.read.format("warc").load(written: _*)
      .select("page_url", "html").as[(String, String)]
      .collect().sorted
    val orig = pages.as[(String, String)].collect().sorted
    assert(back.sameElements(orig))
  }

  test("written bytes are deterministic (retry republish idempotence)") {
    import spark.implicits._
    val pages = Seq(("https://d.test/p", "<html>x</html>"))
      .toDF("page_url", "html")
    val d1 = tmpDir("warc-det1")
    val d2 = tmpDir("warc-det2")
    WarcSink.writePages(pages.coalesce(1), d1.getAbsolutePath).collect()
    WarcSink.writePages(pages.coalesce(1), d2.getAbsolutePath).collect()
    val b1 = java.nio.file.Files.readAllBytes(
      new java.io.File(d1, "pages-00000.warc.gz").toPath)
    val b2 = java.nio.file.Files.readAllBytes(
      new java.io.File(d2, "pages-00000.warc.gz").toPath)
    assert(java.util.Arrays.equals(b1, b2),
      "two writes of the same rows must publish identical bytes — " +
        "retry idempotence and golden checks both rest on this")
  }

  test("the engine's own output is indexable and ranged-fetchable") {
    import spark.implicits._
    // full circle: sink output → buildIndex → digest-verified ranged
    // fetch returns exactly the written pages
    val pages = (0 until 40).map(i =>
      (s"https://c.test/doc$i.html", s"<html><body>page $i</body></html>"))
      .toDF("page_url", "html")
    val dir = tmpDir("warc-circle")
    val written = WarcSink.writePages(pages.repartition(3),
      dir.getAbsolutePath).collect().map(_.getAs[String]("path")).toSeq
    val idx = CcIndex.buildIndex(spark, written,
      mimeOf = _ => "text/html", statusOf = _ => 200)
    assert(idx.count() == 40L)
    // content_digest comes from the record's payload — fetch verifies
    val fetched = CcIndex.fetchHtmlPages(idx)
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val orig = pages.as[(String, String)].collect().sorted
    assert(fetched.sameElements(orig))
  }
}
