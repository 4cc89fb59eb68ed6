package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the prefix-sum operator's two contracts: EXACTNESS (the
  * distributed two-level scan equals a serial scan, for any bucket
  * count and any input partitioning — bucket layout must never leak
  * into results) and SCALABILITY SHAPE (no window over the full input
  * in one partition: every unpartitioned window in the plan is the
  * bounded ≤buckets-row offsets table).
  */
class PackingSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  private def frame(rows: Seq[(Long, Long)], parts: Int) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), parts),
      schema)

  private def serialScan(rows: Seq[(Long, Long)]): Map[Long, Long] =
    rows.sortBy(_._1).scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (k, v)) => (k, acc + v)
    }.sliding(2).map { case Seq((_, acc), (k, _)) => k -> acc }.toMap

  test("distributed prefix sum equals the serial scan") {
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0L until 500L).toVector)
      .map(k => (k, rnd.nextInt(100).toLong + 1))
    val expected = serialScan(rows)
    for (buckets <- Seq(1, 4, 16); parts <- Seq(1, 7)) {
      val got = Packing
        .withPrefixSum(frame(rows, parts), "k", "v", "off", buckets)
        .select("k", "off").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"buckets=$buckets parts=$parts")
    }
  }

  test("skewed keys (many equal quantiles) still scan exactly") {
    // heavy repetition collapses the quantile cut points to duplicates;
    // the operator dedupes them and the result must be unaffected.
    // Keys stay unique (the operator's contract) but CLUSTER tightly.
    val rows = (0L until 300L).map(k => (k, 1L)) ++
      (1000L until 1010L).map(k => (k, 5L))
    val expected = serialScan(rows)
    val got = Packing
      .withPrefixSum(frame(rows, 5), "k", "v", "off", 32)
      .select("k", "off").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("no unpartitioned window touches the input (scale shape)") {
    // AQE wraps materialized stages in leaf nodes a tree collect can't
    // see through; plan SHAPE is a static planning fact, so pin it with
    // AQE off (the BucketingSpec convention)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val rows = (0L until 100L).map(k => (k, 2L))
    val windows =
      try {
        val df = Packing.withPrefixSum(frame(rows, 4), "k", "v", "off", 8)
        df.queryExecution.executedPlan.collectWithSubqueries {
          case w: WindowExec => w
        }
      } finally spark.conf.unset("spark.sql.adaptive.enabled")
    assert(windows.nonEmpty)
    // every window with an EMPTY partition spec must sit above the
    // bucket-totals aggregate (bounded rows), never above the raw scan
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    unpartitioned.foreach { w =>
      val aggBelow = w.collectLeaves().isEmpty || w.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
      }.isDefined
      assert(aggBelow,
        s"unpartitioned window directly over unaggregated input:\n$w")
    }
  }

  test("packSequences span math: boundaries, exact fits, big docs") {
    // seqLen 10; docs: 4, 6 (exact fit at 10), 25 (crosses 2
    // boundaries), 5
    val docs = frame(Seq((1L, 4L), (2L, 6L), (3L, 25L), (4L, 5L)), 2)
    val got = Packing
      .packSequences(docs, "k", col("v"), seqLen = 10, buckets = 2)
      .select("k", "start_off", "first_seq", "last_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 0L), // tokens 0..3
      (2L, 4L, 0L, 0L), // tokens 4..9 — exactly fills sequence 0
      (3L, 10L, 1L, 3L), // tokens 10..34 — sequences 1,2,3
      (4L, 35L, 3L, 3L))) // tokens 35..39
  }

  test("packSequences drops non-positive token counts") {
    val docs = frame(Seq((1L, 3L), (2L, 0L), (3L, 2L)), 1)
    val got = Packing.packSequences(docs, "k", col("v"), 10, 1)
      .select("k", "start_off").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 3L -> 3L))
  }
}
