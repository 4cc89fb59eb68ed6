package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucket count as the read-side parallelism ceiling, measured at the
  * ×1000 decade: a bucketed SMJ runs exactly one task per bucket, so
  * the 8-bucket layout q_bucket_join_read ships (right-sized for the
  * sf0.1 fixture) reads 600M+60M rows on 8 of 32 cores at sf100. This
  * probe lands the SAME tables at a second width and times the same
  * exchange-free join — the production rule it evidences: the bucket
  * count is part of the layout contract and is sized to the CORPUS
  * (cores × a small multiple at landing time), not a constant.
  *
  * Run after BigScaleGen's relational set exists:
  *   SPARK_DRIVER_MEM=96g sbt "runMain graft.tools.BucketWidthProbe \
  *     /root/repo/scale_data/sf100 32"
  */
object BucketWidthProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/scale_data/sf100")
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_") + s"_w$buckets"
    graft.ops.Bucketing.ensureBucketed(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice"),
      s"graft_bw_li_$tag", "l_orderkey", buckets)
    graft.ops.Bucketing.ensureBucketed(
      spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderpriority"),
      s"graft_bw_or_$tag", "o_orderkey", buckets)
    val walls = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      graft.ops.Bucketing.bucketedEquiJoin(spark,
          s"graft_bw_li_$tag", s"graft_bw_or_$tag",
          "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          (sum(graft.queries.QueryUtil.cents(col("l_extendedprice"))) / 100.0)
            .as("sum_price"))
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[bucket-width] dir=$dir buckets=$buckets " +
      f"readJoinWall=${walls.min}%.1f s (passes: " +
      walls.map(w => f"$w%.1f").mkString(", ") + ")")
    spark.stop()
  }
}
