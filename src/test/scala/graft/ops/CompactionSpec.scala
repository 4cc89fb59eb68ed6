package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CompactionSpec extends AnyFunSuite with SparkTestBase {

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collectWithSubqueries {
      case e: ShuffleExchangeExec => e
    }.size

  test("merge compacts to the computed count, content intact") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val df = spark.range(0, 10000).selectExpr("id", "id * 2 AS v")
    df.repartition(16).write.mode("overwrite").parquet(s"$dir/in")
    // target = half the input bytes → 2 files
    val bytes = Compaction.compact(spark, s"$dir/in", s"$dir/probe",
      Long.MaxValue).bytesBefore
    val stats = Compaction.compact(spark, s"$dir/in", s"$dir/out",
      (bytes + 1) / 2)
    assert(stats.filesBefore == 16 && stats.filesAfter == 2, stats.toString)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 10000)
    assert(back.selectExpr("sum(v)").head().getLong(0) ==
      df.selectExpr("sum(v)").head().getLong(0))
  }

  test("merge path plans with zero exchanges; split path shuffles") {
    // plan SHAPE is a static planning fact — pinned with AQE off so
    // materialized stages don't hide exchanges from the tree collect
    // (the BucketingSpec convention)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = Files.createTempDirectory("graft-compact2").toString
      spark.range(0, 1000).toDF("id").repartition(8)
        .write.parquet(s"$dir/in")
      val flat = spark.read.parquet(s"$dir/in")
      assert(exchanges(Compaction.sizedFrame(flat, 2, 8)) == 0,
        "merge must not shuffle")
      assert(exchanges(Compaction.sizedFrame(flat, 16, 8)) == 1,
        "split must shuffle")
      assert(Compaction.sizedFrame(flat, 8, 8) eq flat)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("single-file target and oversized target both land one file") {
    val dir = Files.createTempDirectory("graft-compact3").toString
    spark.range(0, 100).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/in")
    val stats = Compaction.compact(spark, s"$dir/in", s"$dir/out",
      Long.MaxValue)
    assert(stats.filesAfter == 1, stats.toString)
    assert(spark.read.parquet(s"$dir/out").count() == 100)
  }
}
