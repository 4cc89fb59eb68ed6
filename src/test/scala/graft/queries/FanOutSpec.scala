package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins QueryUtil.fanOut's scale-safety claim: the repartition exists
  * ONLY for under-parallelized (unsplittable / single-split) scans and
  * must self-disable on a multi-split production scan — at 100 TB the
  * fan-out must never become a corpus-wide shuffle. The r21 verdict
  * asked for exactly this pin: prove the pre-AQE partition probe sees
  * the post-split count on a multi-file fixture and skips.
  */
class FanOutSpec extends AnyFunSuite with SparkTestBase {

  private def scratch(tag: String): String =
    QueryUtil.scratchPath(s"fanout-spec/$tag")

  test("fanOut repartitions a single-split scan to full parallelism") {
    val p = scratch("single")
    spark.range(0, 100).select(col("id").as("doc_id"))
      .coalesce(1).write.mode("overwrite").parquet(p)
    val scan = spark.read.parquet(p)
    assume(scan.rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism)
    val fanned = QueryUtil.fanOut(scan, "doc_id")
    val plan = fanned.queryExecution.executedPlan.toString
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"single-split scan should fan out:\n${plan.take(1500)}")
    assert(fanned.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("fanOut self-disables on a multi-split scan (no extra exchange)") {
    val p = scratch("multi")
    spark.range(0, 1000).select(col("id").as("doc_id"))
      .repartition(8).write.mode("overwrite").parquet(p)
    // tiny files pack into one split via openCostInBytes; cap the split
    // size so the 8 files genuinely plan as >= defaultParallelism (4)
    // scan partitions — the multi-split shape a production input has
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    spark.conf.set(key, (4L * 1024 * 1024).toString)
    try {
      val scan = spark.read.parquet(p)
      assert(scan.rdd.getNumPartitions >=
        spark.sparkContext.defaultParallelism,
        "fixture must plan as a multi-split scan for this pin")
      val fanned = QueryUtil.fanOut(scan, "doc_id")
      val plan = fanned.queryExecution.executedPlan.toString
      assert(!plan.contains("REPARTITION_BY_NUM") &&
        !plan.contains("Exchange"),
        s"multi-split scan must NOT be repartitioned:\n${plan.take(1500)}")
    } finally spark.conf.set(key, prev)
  }
}
