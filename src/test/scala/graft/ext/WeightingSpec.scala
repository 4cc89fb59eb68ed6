package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class WeightingSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("softDedupWeights discounts every copy by its duplication count") {
    val df = Seq(
      (1L, "fpA"), (2L, "fpA"), (3L, "fpA"), // 3 copies -> 333 each
      (4L, "fpB"), // unique -> 1000
      (5L, "fpC"), (6L, "fpC")) // 2 copies -> 500 each
      .toDF("doc_id", "fp")
    val got = Weighting.softDedupWeights(df, Seq("fp"))
      .select("doc_id", "copies", "weight_milli")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 333L), (2L, 3L, 333L), (3L, 3L, 333L),
      (4L, 1L, 1000L), (5L, 2L, 500L), (6L, 2L, 500L)))
  }

  test("softDedupWeights keeps null-keyed rows (null-safe join)") {
    // a fingerprint of absent text is null — soft dedup must NOT
    // silently delete those rows (the one thing it promises)
    val df = Seq((1L, Some("fpA")), (2L, None), (3L, None))
      .toDF("doc_id", "fp")
    val got = Weighting.softDedupWeights(df, Seq("fp"))
      .select("doc_id", "copies", "weight_milli")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 1000L), (2L, 2L, 500L),
      (3L, 2L, 500L)))
  }

  test("softDedupWeights counts are a combinable aggregation") {
    val df = Seq((1L, "a")).toDF("doc_id", "fp")
    val plan = Weighting.softDedupWeights(df, Seq("fp"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"))
  }

  test("temperatureWeights flattens the head group (alpha = 1/2)") {
    // 100 'big' docs vs 4 'small': raw share 96%, sqrt share 10/12
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 104).map(i => (i.toLong, "small"))).toDF("id", "src")
    val got = Weighting.temperatureWeights(df, "src")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got("big") == ((100L, 10L * 1000L / 12L))) // 833
    assert(got("small") == ((4L, 2L * 1000L / 12L))) // 166
    // temperature pulled big's share below its raw 96%
    assert(got("big")._2 < 960L && got("big")._2 > got("small")._2)
  }

  test("temperatureWeights clamps a vanishing tail group to weight 1, not 0") {
    // head sq dwarfs tail sq so the tail's integer share rounds to 0 —
    // a 0 weight would make weightedReplicas DELETE the low-resource
    // group this operator exists to protect
    val df = ((1 to 5000).map(i => (i.toLong, "head")) ++
      Seq((9001L, "tail"))).toDF("id", "src")
    val got = Weighting.temperatureWeights(df, "src")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // head sq = 70, tail sq = 1, total 71: tail share 1000/71 = 14;
    // shrink the scale to force the rounding edge
    val tiny = Weighting.temperatureWeights(df, "src", scaleMilli = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tiny("tail") === 1L) // (1*10) div 71 = 0 -> clamped
    assert(got("tail") === 14L)
  }

  test("importanceScores ranks target-like documents above corpus-like ones") {
    // corpus: 3 "code" docs, 3 "prose" docs; target = the code docs.
    // A code-vocabulary doc must out-score a prose one.
    val corpus = Seq(
      (1L, "def func return class import"),
      (2L, "def class lambda yield import"),
      (3L, "return yield func lambda def"),
      (4L, "the cat sat on the mat"),
      (5L, "a dog ran in the park"),
      (6L, "rain fell on the green hill"))
      .toDF("doc_id", "text")
    val target = corpus.where(col("doc_id") <= 3)
    val got = Weighting.importanceScores(corpus, "doc_id",
      split(col("text"), " "), target, split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(Seq(1L, 2L, 3L).map(got).min > Seq(4L, 5L, 6L).map(got).max)
    // a token absent from the target contributes ratio 0, so an
    // all-prose doc with zero target overlap scores low but exists
    assert(got.keySet == (1L to 6L).toSet)
  }

  test("importanceScores is exactly reproducible (integer, no float drift)") {
    val corpus = Seq((1L, "x y z"), (2L, "x q r"), (3L, "q r s"))
      .toDF("doc_id", "text")
    val target = corpus.where(col("doc_id") === 1)
    def run() = Weighting.importanceScores(corpus, "doc_id",
      split(col("text"), " "), target, split(col("text"), " "))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(run() == run())
    // Ct=9, Tt=3; x occurs twice in the corpus (docs 1,2) so its ratio
    // is (1*9*1000)/(2*3)=1500; y,z are corpus-unique: (1*9*1000)/(1*3)
    // =3000 each. doc 1 = mean(1500,3000,3000) = 2500 (exact integers,
    // no bucket collisions among 6 tokens in 65536)
    assert(run().head == ((1L, 3L, 2500L)))
  }

  test("capPerDomain keeps at most k per registered domain, deterministically") {
    val df = (1L to 10L).map { i =>
      val dom = if (i <= 7) "big.test" else "small.test"
      (i, s"https://www$i.$dom/page/$i")
    }.toDF("doc_id", "url")
    val got = UrlAnalysis.capPerDomain(df, "url", "doc_id", k = 3)
      .select("doc_id", "reg_domain", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDom = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom("big.test") === 3) // 7 candidates capped to 3
    assert(byDom("small.test") === 3) // all 3 kept
    assert(got.forall(_._3 <= 3))
    // deterministic: identical keep set on re-run
    val again = UrlAnalysis.capPerDomain(df, "url", "doc_id", k = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == got.map(_._1).sorted.toSeq)
  }

  test("capPerDomain prunes map-side via WindowGroupLimit") {
    // needs more input rows than k: the optimizer (correctly) skips the
    // group-limit when the child's maxRows is already within the limit
    val df = (1L to 10L).map(i => (i, s"https://a.test/$i"))
      .toDF("doc_id", "url")
    val plan = UrlAnalysis.capPerDomain(df, "url", "doc_id", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter lost its group-limit pushdown:\n${plan.take(2000)}")
  }
}
