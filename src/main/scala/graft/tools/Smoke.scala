package graft.tools

import org.apache.spark.sql.SparkSession

/** Local simulation of the driver's t1 smoke: SparkEntry.entry rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"""{"t1_rows":$n,"ok":${n > 0}}""")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
