package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class InterchangeSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private def frame(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

  test("CSV round-trips hostile content byte-exact") {
    val rows = Seq(
      Row(1L, "plain"),
      Row(2L, "comma, inside"),
      Row(3L, "quote \" and \"\" doubled"),
      Row(4L, "newline\nand\r\nCRLF"),
      Row(5L, "backslash \\ and tab\there"),
      Row(6L, " leading and trailing "),
      Row(7L, "unicode: naïve café — ßµ"))
    val dir = Files.createTempDirectory("graft-csv-spec").toString
    val back = Interchange.csvRoundTrip(frame(rows), s"$dir/t")
    assert(back.collect().toSet == rows.toSet)
  }

  test("CSV round-trips empty string distinct from null; the \\N " +
      "sentinel is the one pinned casualty") {
    // null rides the MySQL-dump sentinel \N so "" survives verbatim
    // (Spark's defaults read both back as null). The residual
    // lossiness — a payload that IS the literal string \N — is pinned
    // here: the reader applies the sentinel after unquoting, so no
    // quoting scheme can shield it.
    val rows = Seq(Row(1L, null), Row(2L, ""), Row(3L, "x"),
      Row(4L, "\\N"), Row(5L, "x\\Ny"))
    val dir = Files.createTempDirectory("graft-csv-null").toString
    val back = Interchange.csvRoundTrip(frame(rows), s"$dir/t")
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq(null, "", "x", null, "x\\Ny"))
  }

  test("text files round-trip hostile payloads, one file per doc") {
    val rows = Seq(
      Row(1L, "plain"),
      Row(2L, "embedded\nnewlines\nhere"),
      Row(3L, "trailing newline\n"),
      Row(4L, "double trailing\n\n"),
      Row(5L, ""),
      Row(6L, "unicode naïve — ßµ"))
    val dir = Files.createTempDirectory("graft-txt-spec").toString
    val back = Interchange.textFilesRoundTrip(frame(rows),
      "id", "text", s"$dir/t")
    assert(back.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      rows.map(r => r.getLong(0) -> r.getString(1)).toMap)
    // one directory per doc, exactly one data file inside
    val docDirs = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.startsWith("id="))
    assert(docDirs.length == rows.length)
    assert(docDirs.forall(
      _.listFiles().count(_.getName.startsWith("part-")) == 1))
  }

  test("ORC round-trips values and pushes the read filter into the scan") {
    val rows = (0L until 100L).map(i => Row(i, s"doc$i"))
    val dir = Files.createTempDirectory("graft-orc-spec").toString
    val back = Interchange.orcRoundTrip(frame(rows), s"$dir/t")
    assert(back.collect().toSet == rows.toSet)
    val filtered = back.where(col("id") > 90)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"),
      s"expected ORC pushdown in:\n$plan")
    assert(filtered.count() == 9)
  }
}
