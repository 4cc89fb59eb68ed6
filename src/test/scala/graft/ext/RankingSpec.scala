package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed expectations for the integer TF-IDF / BM25 pipelines
  * (graft.ext.Ranking) on a 3-doc corpus, plus the structural LSH
  * property the recall audit rests on: verified pairs ⊆ candidate pairs
  * for the same banding.
  */
class RankingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // d0: "a a b", d1: "a c", d2: "b c c c"
  private def corpus = Seq(
    (0L, "a a b"), (1L, "a c"), (2L, "b c c c")
  ).toDF("doc_id", "text")

  test("tfIdfTopK: exact rational scores and rank order") {
    // N=3. df: a→2, b→2, c→2.
    // score_milli = tf*N*1000 div df = tf*3000 div 2 = tf*1500.
    // d0: a tf=2 → 3000, b tf=1 → 1500 → rank a(1), b(2)
    // d2: c tf=3 → 4500, b tf=1 → 1500 → rank c(1), b(2)
    val out = Ranking.tfIdfTopK(corpus, col("doc_id"),
      split(col("text"), " "), k = 2)
      .orderBy("doc_id", "rk")
      .select("doc_id", "token", "tf", "df", "score_milli", "rk")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, "a", 2L, 2L, 3000L, 1L), (0L, "b", 1L, 2L, 1500L, 2L),
      (1L, "a", 1L, 2L, 1500L, 1L), (1L, "c", 1L, 2L, 1500L, 2L),
      (2L, "c", 3L, 2L, 4500L, 1L), (2L, "b", 1L, 2L, 1500L, 2L)))
  }

  test("bm25: milli-scaled integer pipeline matches hand computation") {
    // dl: d0=3, d1=2, d2=4; N=3; avgdl_milli = 9*1000 div 3 = 3000.
    // Query {"c"}: df(c)=2 → idf_milli = ((6-4+1)*1000) div 5 = 600.
    // d1 (tf=1, dl=2): inner = 250 + (750*2*1000) div 3000 = 750
    //   denom = 1000 + (1200*750) div 1000 = 1900
    //   term  = (600*1*2200) div 1900 = 1320000 div 1900 = 694
    // d2 (tf=3, dl=4): inner = 250 + (750*4*1000) div 3000 = 1250
    //   denom = 3000 + (1200*1250) div 1000 = 4500
    //   term  = (600*3*2200) div 4500 = 3960000 div 4500 = 880
    val out = Ranking.bm25(corpus, col("doc_id"),
      split(col("text"), " "), Seq("c"))
      .orderBy("doc_id")
      .select("doc_id", "score_milli", "n_terms_hit")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 694L, 1L), (2L, 880L, 1L)))
  }

  test("bm25: longer doc scores below shorter doc at equal tf") {
    // length normalization: same tf, bigger dl → bigger denom → lower
    // score. d0 and d1 both have tf(a)=... use query {"b"}: d0 tf=1
    // dl=3, d2 tf=1 dl=4 → d0 must outrank d2.
    val out = Ranking.bm25(corpus, col("doc_id"),
      split(col("text"), " "), Seq("b"))
      .select("doc_id", "score_milli")
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(0L, 2L))
    assert(out(0L) > out(2L))
  }

  test("lsh verified pairs are a subset of candidate pairs (same config)") {
    val docs = Seq(
      (0L, "x y z w"), (1L, "x y z w"), (2L, "x y z q"),
      (3L, "p q r s"), (4L, "p q r s")
    ).toDF("doc_id", "text")
    val tks = array_distinct(split(col("text"), " "))
    val cand = NearDup.lshCandidatePairs(docs, col("doc_id"), tks,
      bands = 4, rowsPerBand = 2, maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    val verified = NearDup.lshNearDupPairs(docs, col("doc_id"), tks,
      bands = 4, rowsPerBand = 2, maxBucket = 10, minJaccard = 0.6)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(verified.subsetOf(cand))
    // identical docs must be found
    assert(verified.contains((0L, 1L)) && verified.contains((3L, 4L)))
  }
}
