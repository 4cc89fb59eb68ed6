package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.wat.ProcessWat

class LinkOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randStr(n: Int): String =
    (0 until rnd.nextInt(n)).map(_ => (rnd.nextInt(94) + 33).toChar).mkString

  test("uid column = md5(alt + url), parity with MessageDigest on random input") {
    val rows = (1 to 200).map(_ => (randStr(20), "http://x.test/" + randStr(30)))
    val got = rows.toDF("alt", "url")
      .select(col("alt"), col("url"), LinkOps.uid(col("alt"), col("url")).as("uid"))
      .collect()
    got.foreach { r =>
      assert(r.getString(2) == ProcessWat.md5Hex(r.getString(0) + r.getString(1)))
    }
  }

  test("text predicate follows split-on-dot, not endswith") {
    val urls = Seq(
      "http://a/x.pdf" -> true,
      "http://a/x.pdf?x=1" -> false, // endswith would also reject, split definitely
      "http://a/x.PDF" -> false,     // case-sensitive like the reference
      "http://a/x.tar.md" -> true,
      "nodots" -> false,
      "trailing.dot." -> false)
    val got = urls.map(_._1).toDF("url")
      .select(col("url"), LinkOps.validTextLink(col("url")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    urls.foreach { case (u, want) => assert(got(u) == want, u) }
  }

  test("audio/video predicates are suffix matches") {
    val df = Seq("http://a/x.mp3", "http://a/x.mp4", "http://a/x.mp3.html")
      .toDF("url")
      .select(LinkOps.validAudioLink(col("url")).as("a"),
        LinkOps.validVideoLink(col("url")).as("v"))
      .collect()
    assert(df(0).getBoolean(0) && !df(0).getBoolean(1))
    assert(!df(1).getBoolean(0) && df(1).getBoolean(1))
    assert(!df(2).getBoolean(0) && !df(2).getBoolean(1))
  }

  test("dedup is idempotent and union+dedup == dedup of concat (C1/C2 contract)") {
    val rows = (1 to 500).map(_ => (rnd.nextInt(50).toString, rnd.nextInt(10)))
    val df = rows.toDF("uid", "v").select(col("uid"))
    val once = Dedup.byKey(df, Seq("uid"))
    val twice = Dedup.byKey(once, Seq("uid"))
    assert(once.collect().map(_.getString(0)).sorted
      .sameElements(twice.collect().map(_.getString(0)).sorted))
    val half = df.limit(250)
    val merged = Dedup.byKey(half.union(df), Seq("uid"))
    assert(merged.collect().map(_.getString(0)).sorted
      .sameElements(once.collect().map(_.getString(0)).sorted))
  }

  test("unknown document type raises") {
    intercept[IllegalArgumentException] {
      LinkOps.forDocumentType("bogus", col("link"))
    }
  }
}
