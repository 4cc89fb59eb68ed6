package graft.ops


import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Bucketed-write co-located join: both sides bucketed on the join key →
  * the sort-merge join needs NO shuffle exchange. This is the 100 TB
  * pattern for repeated joins on the same key (pre-shuffle once at write
  * time, join many times for free).
  */
class BucketingSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    // spark.sql.warehouse.dir is static — tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(joined.count() == li.count()) // every lineitem has its order

    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }
}
