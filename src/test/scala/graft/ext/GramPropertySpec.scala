package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property parity for the gram primitives against naive driver-side
  * reference implementations — the drift guard for their performance
  * rewrites (ngrams went transform→zip_with, charBigrams went
  * substr-loop→split+zip_with; both must have changed NOTHING
  * semantically).
  */
class GramPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val token: Gen[String] = Gen.oneOf(
    "a", "bb", "word", "x1", "É", "多", "%", "", "tok")
  private val tokenList: Gen[List[String]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, token))

  test("ngrams == sliding windows of the token array, for n in 1..4") {
    // one Spark job per batch, not per case: sample lists driver-side,
    // evaluate in a single DataFrame pass
    val rnd = new scala.util.Random(7)
    val params = Gen.Parameters.default
    val cases = Seq.fill(200)(
      tokenList(params, org.scalacheck.rng.Seed(rnd.nextLong()))
        .getOrElse(Nil))
    for (n <- 1 to 4) {
      val got = cases.zipWithIndex.map { case (ts, i) => (i, ts) }
        .toDF("i", "tk")
        .select(col("i"), Contamination.ngrams(col("tk"), n).as("g"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
      cases.zipWithIndex.foreach { case (ts, i) =>
        val want = if (ts.size < n) Nil
          else ts.sliding(n).map(_.mkString(" ")).toList
        assert(got(i) == want, s"n=$n tokens=$ts")
      }
    }
  }

  private val textGen: Gen[String] = Gen.choose(0, 30).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf(('a' to 'e') ++ Seq(' ', 'É', '多', '.')))
      .map(_.mkString))

  test("charBigrams == sliding(2) over characters, incl. multi-byte UTF-8") {
    val rnd = new scala.util.Random(11)
    val params = Gen.Parameters.default
    val cases = Seq.fill(300)(
      textGen(params, org.scalacheck.rng.Seed(rnd.nextLong())).getOrElse(""))
    val got = cases.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "text")
      .select(col("i"), TextAnalysis.charBigrams(col("text")).as("b"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    cases.zipWithIndex.foreach { case (t, i) =>
      val want = if (t.length < 2) Nil
        else t.sliding(2).toList
      assert(got(i) == want, s"text='$t'")
    }
  }

  test("winnowing density and coverage properties on random documents") {
    // For any doc with >= w full windows: fingerprints are a non-empty
    // subset of its gram hashes, and every gram run of length w
    // contributes its window minimum — checked via the naive driver
    // implementation of the same algorithm.
    val rnd = new scala.util.Random(13)
    val docs = (0 until 40).map { i =>
      val n = 6 + rnd.nextInt(30)
      (i.toLong, (0 until n).map(_ => s"t${rnd.nextInt(8)}").mkString(" "))
    }
    val (k, w) = (3, 4)
    val got = NearDup.winnowFingerprints(docs.toDF("doc_id", "text"),
        "doc_id", TextAnalysis.tokens(col("text")), k, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
        16)
    }
    docs.foreach { case (id, text) =>
      val grams = text.split(" ").toList.sliding(k).map(_.mkString(" ")).toList
      val hs = grams.map(h32)
      val want =
        if (hs.size < w) Set.empty[Long]
        else hs.zipWithIndex.sliding(w)
          .map(_.minBy { case (h, p) => (h, p) }._1).toSet
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id '$text'")
    }
  }
}
