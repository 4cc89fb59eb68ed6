package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object FlagCheck {
  def main(args: Array[String]): Unit = {
    val flag = args.headOption.getOrElse("false")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", flag)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val or = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    graft.ops.Bucketing.writeBucketed(li, "fc_li", "l_orderkey", 4)
    graft.ops.Bucketing.writeBucketed(or, "fc_or", "o_orderkey", 4)
    val j = graft.ops.Bucketing.bucketedEquiJoin(spark, "fc_li", "fc_or",
      "l_orderkey", "o_orderkey")
    val plan = j.queryExecution.executedPlan
    val sorts = plan.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.SortExec => s }.size
    val exch = plan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }.size
    println(s"[flag-check] legacyFlag=$flag sorts=$sorts exchanges=$exch")
    spark.stop()
  }
}
