package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ext.{TextAnalysis => TA}

class NfcNormalizeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("composed and decomposed forms normalize to identical strings") {
    val decomposed = "café"  // e + combining acute
    val precomposed = "café"  // U+00E9
    val rows = Seq((1L, decomposed), (2L, precomposed), (3L, "ascii only"))
      .toDF("id", "t")
      .select(col("id"), TA.nfc(col("t")).as("n"), length(TA.nfc(col("t"))).as("l"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows(0)._2 == rows(1)._2, "NFC must unify the two forms")
    assert(rows(0)._3 == 4 && rows(1)._3 == 4)
    assert(rows(2)._2 == "ascii only", "ASCII is a fast-path no-op")
  }

  test("null propagates; already-NFC text returns unchanged") {
    val out = Seq(Option("xéy"), None).toDF("t")
      .select(TA.nfc(col("t")).as("n")).collect()
    assert(out(0).getString(0) == "xéy")
    assert(out(1).isNullAt(0))
  }

  test("expression participates in codegen (no fallback errors) on volume") {
    val n = (1L to 20000L).toDF("i")
      .select(TA.nfc(concat(lit("v"), col("i"), lit("é"))).as("n"))
      .where(length(col("n")) > 2)
      .count()
    assert(n == 20000L)
  }
}
