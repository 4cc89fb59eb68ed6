package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** AQE skew-join handling — the runtime half of the skew story (the
  * write-side half is the salted dedup in ops.Dedup): one hot key holds
  * most of a join's rows, and AQE splits its oversized shuffle
  * partition into parallel sub-tasks instead of letting one straggler
  * task process it alone. This spec drives a deliberately skewed join
  * under aggressive skew thresholds and asserts the executed plan
  * marked the sort-merge join as skew-handled.
  */
class SkewJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("AQE splits a skewed join partition (skew=true in the plan)") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE key + a sprinkle of others vs a small right side
      val left = spark.range(0, 50000)
        .select(when(col("id") % 100 === 0, col("id") % 7 + 1)
          .otherwise(lit(0L)).as("k"),
          concat(lit("payload-"), col("id")).as(("v")))
      val right = Seq.tabulate(8)(i => (i.toLong, s"dim-$i")).toDF("k", "name")
      val joined = left.join(right, "k")
      // execute THIS queryExecution so its adaptive plan finalizes —
      // count() would build and execute a separate plan instance
      val qe = joined.queryExecution
      assert(qe.toRdd.count() == 50000)
      // the finalized adaptive plan nests the join inside query-stage
      // wrappers that plan.collect does not traverse — assert on the
      // rendered final plan instead
      val plan = qe.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)"),
        s"no skew-handled sort-merge join in:\n${plan.take(4000)}")
      assert(plan.contains("AQEShuffleRead coalesced and skewed"),
        s"no skewed shuffle read in:\n${plan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
