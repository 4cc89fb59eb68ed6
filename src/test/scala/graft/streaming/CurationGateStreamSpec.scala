package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The streaming curation gate is STATELESS: boilerplate strip +
  * blocklist gate as pure column expressions in append mode — no
  * watermark, no state store — and its verdicts match the batch gate
  * on the same rows.
  */
class CurationGateStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val terms = Seq("casino", "spam")

  private def page(body: String): String =
    "<nav><a href=\"/\">home</a> <a href=\"/b\">nav two</a></nav><p>" +
      body + "</p><footer><a href=\"/c\">contact</a> <a href=\"/d\">tos</a> x</footer>"

  test("stateless streaming gate: strip + blocklist verdicts, append mode") {
    val in = Files.createTempDirectory("cur-gate").toString
    val rows = Seq(
      (1L, page("a perfectly clean body paragraph")),
      (2L, page("visit the casino body paragraph")), // flagged -> dropped
      (3L, page("another clean body of words here")),
      (4L, "<nav><a href=\"/x\">nav only page</a></nav>") // strips to ''
    )
    rows.toDF("doc_id", "html").coalesce(1).write.parquet(s"$in/b1")

    val stream = spark.readStream.schema("doc_id LONG, html STRING")
      .parquet(s"$in/*")
    val q = StreamOps.curationGateStream(stream, "html", terms)
      .writeStream.outputMode("append").format("memory")
      .queryName("cur_gate").start()
    q.processAllAvailable()
    // stateless by construction: the progress report carries no state
    // operators (a groupBy/dedup here would list one with its rows)
    val stateOps = Option(q.lastProgress)
      .map(_.stateOperators.length).getOrElse(0)
    q.stop()

    val got = spark.sql("select doc_id, clean_text from cur_gate")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.keySet == Set(1L, 3L),
      "flagged and empty-after-strip docs must not pass the gate")
    assert(got(1L) == "a perfectly clean body paragraph")
    assert(got(3L) == "another clean body of words here")
    assert(stateOps == 0,
      s"the gate must not run stateful operators (got $stateOps)")
  }
}
