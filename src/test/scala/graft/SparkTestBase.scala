package graft

import org.apache.spark.sql.SparkSession

/** One session per suite; suites run sequentially (build.sbt) because the
  * pipeline suite restarts sessions (C3 parity).
  */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.fresh()
}

object SparkTestBase {
  def fresh(): SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
