package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Two-phase politeness rank: exact equality with the naive
  * single-window rank on skewed data, bucket-boundary edges, the
  * capped variant, and the no-corpus-second-shuffle plan shape.
  */
class PolitenessSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def frontier(n: Long, hotShare: Long) = spark.range(n).select(
    col("id").as("doc_id"),
    when(col("id") % hotShare === 0L, lit("hot.test"))
      .otherwise(concat(lit("d"), (col("id") % 7).cast("string"),
        lit(".test"))).as("domain"),
    concat(lit("/p"), col("id").cast("string")).as("path"),
    when(col("id") % 3 === 0, lit(2.0)).otherwise(lit(null))
      .cast("double").as("crawl_delay_sec"))

  test("two-phase rank equals the naive window rank exactly") {
    val f = frontier(5000L, 2L) // half the rows on one hot domain
    // tiny bucketWidth forces MANY buckets — every recombination path
    // (multi-bucket domains, single-row buckets, empty buckets) runs
    val got = Politeness.schedule(f, "domain", "doc_id",
        "crawl_delay_sec", bucketWidth = 64L)
      .select("doc_id", "domain", "slot", "eta_sec")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val want = Politeness.scheduleNaive(f, "domain", "doc_id",
        "crawl_delay_sec")
      .select("doc_id", "domain", "slot", "eta_sec")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(got.length == 5000 && got.sameElements(want))
  }

  test("bucket boundaries: order values AT multiples of the width") {
    // doc_ids 0,64,128… sit exactly on 64-wide bucket boundaries
    val f = spark.range(10).select((col("id") * 64L).as("doc_id"),
      lit("one.test").as("domain"), lit("/p").as("path"),
      lit(null).cast("double").as("crawl_delay_sec"))
    val got = Politeness.schedule(f, "domain", "doc_id",
        "crawl_delay_sec", bucketWidth = 64L)
      .select("doc_id", "slot").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == (0 until 10).map(i => (i * 64L, i.toLong)))
  }

  test("scheduleCapped drops rows past the per-domain quota") {
    val f = frontier(1000L, 2L)
    val capped = Politeness.scheduleCapped(f, "domain", "doc_id",
      "crawl_delay_sec", maxPerDomain = 25L, bucketWidth = 64L)
    val byDomain = capped.groupBy("domain")
      .agg(count(lit(1)).as("n"), max("slot").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(byDomain.nonEmpty)
    for ((d, n, mx) <- byDomain) {
      assert(n <= 25L, s"$d over quota: $n")
      assert(mx < 25L, s"$d slot past cap: $mx")
    }
    // the kept rows are exactly the first-by-doc_id per domain
    val hotKept = capped.where(col("domain") === "hot.test")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(hotKept.toSeq == (0L until 50L by 2).take(25))
  }

  test("plan: the corpus shuffles once; the bases branch is aggregate-sized") {
    val f = frontier(5000L, 2L)
    val plan = Politeness.schedule(f, "domain", "doc_id",
        "crawl_delay_sec", bucketWidth = 64L)
      .queryExecution.executedPlan.toString
    // exactly ONE corpus-keyed hash exchange: (domain, bucket) for the
    // window; the bases branch exchanges only aggregate rows (its
    // exchange sits above a partial HashAggregate)
    val corpusExchanges =
      "Exchange hashpartitioning\\(domain#\\d+, graft_bucket#\\d+L, "
        .r.findAllIn(plan).size
    assert(corpusExchanges <= 2, // window + (pre-AQE) bases-join side
      s"too many (domain, bucket) exchanges:\n$plan")
    assert(plan.contains("HashAggregate"),
      "bases must map-side combine before shuffling")
  }
}
