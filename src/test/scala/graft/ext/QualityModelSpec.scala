package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class QualityModelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("scoreWithWeights: hand-computed means, OOV=0, bias, floor div toward zero") {
    val docs = Seq(
      (1L, "good good bad"),   // w: 300+300-500=100, n=3 → 100 div 3 = 33
      (2L, "bad bad good"),    // -500-500+300=-700, n=3 → -700 div 3 = -233
      (3L, "oov1 oov2"),       // 0, n=2 → 0 → keep
      (4L, "bad oov1")         // -500, n=2 → -250 → drop
    ).toDF("doc_id", "text")
    val w = Seq(("good", 300L), ("bad", -500L)).toDF("token", "w_milli")
    val out = QualityModel.scoreWithWeights(docs, "doc_id",
      split(col("text"), " "), w)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 33L, "keep"),
      (2L, 3L, -233L, "drop"),
      (3L, 2L, 0L, "keep"),
      (4L, 2L, -250L, "drop")))
  }

  test("bias shifts the sum before the division") {
    val docs = Seq((1L, "bad bad")).toDF("doc_id", "text")
    val w = Seq(("bad", -99L)).toDF("token", "w_milli")
    // (-198 + 200) div 2 = 1 → keep
    val out = QualityModel.scoreWithWeights(docs, "doc_id",
      split(col("text"), " "), w, biasMilli = 200L).collect().head
    assert(out.getLong(2) == 1L && out.getString(3) == "keep")
  }

  test("hashedScore matches a driver-side recomputation and is label-consistent") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta"),
      (3L, "alpha alpha alpha")
    ).toDF("doc_id", "text")
    val out = QualityModel.hashedScore(docs, "doc_id",
      split(col("text"), " "), biasMilli = 7L)
      .orderBy("doc_id").collect()

    def h32(s: String): Long = {
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    def weight(t: String): Long = h32("qw|" + t) % 2001 - 1000
    val texts = Map(1L -> "alpha beta gamma delta",
      2L -> "epsilon zeta", 3L -> "alpha alpha alpha")
    out.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ").toSeq
      val wsum = toks.map(weight).sum + 7L
      val want = wsum / toks.size // JVM / truncates toward zero, like div
      assert(r.getLong(1) == toks.size.toLong)
      assert(r.getLong(2) == want, s"doc ${r.getLong(0)}")
      assert(r.getString(3) == (if (want >= 0) "keep" else "drop"))
    }
  }
}
