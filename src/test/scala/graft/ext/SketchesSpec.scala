package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The Misra-Gries guarantee under Spark's partial/final aggregation
  * contract: for ANY partitioning of the stream into chunks, reducing
  * each chunk and merging the summaries must retain every item with
  * true count > n/(m+1). The end-to-end heavyHitters output must then
  * be EXACTLY the exact-count answer (sketch = candidate pruning only).
  */
class SketchesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Zipf-ish skewed stream: item k drawn with weight ~ 1/(k+1). */
  private def skewedStream(rnd: scala.util.Random, n: Int, vocab: Int): Seq[String] = {
    val weights = (0 until vocab).map(k => 1.0 / (k + 1))
    val total = weights.sum
    Seq.fill(n) {
      var u = rnd.nextDouble() * total
      var k = 0
      while (u > weights(k) && k < vocab - 1) { u -= weights(k); k += 1 }
      s"w$k"
    }
  }

  test("sketch-level: reduce+merge over random chunkings retains all heavy items") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 30) {
      val m = 1 + rnd.nextInt(12)
      val n = 50 + rnd.nextInt(500)
      val vocab = 2 + rnd.nextInt(40)
      val stream = skewedStream(rnd, n, vocab)
      val agg = new Sketches.MisraGries(m)
      // random chunking: split into 1..8 chunks, reduce each, merge in
      // random order (merge must be order-insensitive for correctness)
      val nChunks = 1 + rnd.nextInt(8)
      val chunks = stream.grouped(math.max(1, n / nChunks)).toSeq
      val summaries = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(summaries).reduce(agg.merge)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val heavy = exact.filter(_._2 * (m + 1) > n).keys.toSet
      val candidates = agg.finish(merged).toSet
      assert(heavy.subsetOf(candidates),
        s"trial $trial m=$m n=$n: lost ${heavy -- candidates}")
      assert(merged.size <= m, s"summary overflow: ${merged.size} > $m")
    }
  }

  test("undercount bound: sketch count within n/(m+1) of truth") {
    val rnd = new scala.util.Random(7)
    val m = 9
    val stream = skewedStream(rnd, 400, 25)
    val agg = new Sketches.MisraGries(m)
    val chunks = stream.grouped(37).toSeq
    val merged = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    merged.foreach { case (k, c) =>
      val t = exact.getOrElse(k, 0L)
      assert(c <= t, s"$k overcounted: sketch $c > true $t")
      assert(t - c <= stream.size / (m + 1),
        s"$k undercount ${t - c} exceeds n/(m+1)")
    }
  }

  test("heavyHitters end-to-end equals the exact answer on a skewed frame") {
    val rnd = new scala.util.Random(13)
    val stream = skewedStream(rnd, 3000, 50)
    val df = stream.toDF("token").repartition(7) // force real partials
    for (m <- Seq(4, 15)) {
      val got = Sketches.heavyHitters(df, m)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val want = exact.filter(_._2 * (m + 1) > stream.size).toMap
      assert(got == want, s"m=$m")
    }
  }

  test("nulls ignored; multi-column input rejected") {
    val df = Seq(Some("a"), None, Some("a"), Some("b")).toDF("token")
    val got = Sketches.heavyHitters(df, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stream length 3 (null dropped): a=2 (2*11>3), b=1 (11>3)
    assert(got == Map("a" -> 2L, "b" -> 1L))
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(Seq(("a", 1)).toDF("x", "y"), 5)
    }
  }
}
