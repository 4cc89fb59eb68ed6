package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BoilerplateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("link-dense chrome drops, body text survives in block order") {
    val html =
      "<nav><a href=\"/\">home</a> <a href=\"/b\">about us</a></nav>" +
        "<p>first body paragraph with real words</p>" +
        "<div>second body block also long enough</div>" +
        "<footer><a href=\"/c\">contact</a> <a href=\"/t\">terms</a> x</footer>"
    val got = Boilerplate.extractMainContent(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .collect().head
    assert(got.getLong(1) == 4, "four content-bearing blocks")
    assert(got.getLong(2) == 2, "only the two body blocks survive")
    assert(got.getString(4) ==
      "first body paragraph with real words " +
        "second body block also long enough",
      "kept blocks rejoin in document order")
    assert(got.getLong(3) > 0 && got.getLong(3) < 1000,
      "boiler share strictly between 0 and 1000 milli")
  }

  test("short fragments and all-chrome pages price as pure boilerplate") {
    val html = "<nav><a href=\"/x\">only navigation here</a></nav><p>tiny</p>"
    val got = Boilerplate.extractMainContent(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .collect().head
    assert(got.getLong(2) == 0 && got.getLong(3) == 1000)
    assert(got.getString(4) == "", "no kept text, empty not null")
  }

  test("a page with no visible text produces no row (empty unnest)") {
    val df = Boilerplate.extractMainContent(
      Seq((1L, "<div></div><p> </p>")).toDF("doc_id", "html"),
      "doc_id", "html")
    assert(df.count() == 0)
  }

  test("stripColumn (per-row form) agrees with the batch explode form") {
    import graft.queries.QueryUtil
    val docs = QueryUtil.table(spark, "/root/testdata/sf0.001", "documents")
      .where(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), concat(
        lit("<nav><a href=\"/\">home</a> <a href=\"/b\">more nav</a></nav><p>"),
        col("text"),
        lit("</p><footer><a href=\"/c\">contact</a> <a href=\"/d\">legal</a> x</footer>"))
        .as("html"))
    val batch = Boilerplate.extractMainContent(docs, "doc_id", "html")
      .select(col("doc_id"), col("clean_text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val perRow = docs
      .select(col("doc_id"), Boilerplate.stripColumn(col("html")).as("ct"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // batch omits pages with no content-bearing blocks; per-row
    // reports '' there — on the overlap they must agree exactly
    assert(batch.nonEmpty)
    batch.foreach { case (id, ct) =>
      assert(perRow(id) == ct, s"doc $id diverges")
    }
    perRow.filterNot { case (id, _) => batch.contains(id) }
      .foreach { case (id, ct) =>
        assert(ct == "", s"doc $id: per-row must report '' where batch omits")
      }
  }

  test("splitPattern rejects non-[a-z0-9] tags (regex parity guard)") {
    intercept[IllegalArgumentException](
      Boilerplate.splitPattern(Seq("di.v")))
  }
}
