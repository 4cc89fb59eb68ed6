package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Executes one named query and dumps its FINAL adaptive physical plan —
  * the evidence tool behind plan-audit notes (ReusedExchange counts,
  * exchange shapes, WindowGroupLimit presence are only trustworthy on the
  * post-AQE plan, which `.explain` before an action does not show).
  *
  * Usage: `runMain graft.tools.PlanDump <queryName> [sfDir]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: PlanDump <query> [sfDir]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // trust the write-time bucket sort on read (safe: Spark still
      // re-sorts any bucket with more than one file; Bucketing writes
      // exactly one sorted file per bucket so SMJs stream sort-free)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.toRdd.count() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    println(s"=== $name final adaptive plan ===")
    println(plan)
    println(s"=== node counts: Exchange=${
      "(?<!Reused)Exchange".r.findAllIn(plan).size}, ReusedExchange=${
      "ReusedExchange".r.findAllIn(plan).size}, WindowGroupLimit=${
      "WindowGroupLimit".r.findAllIn(plan).size} ===")
    spark.stop()
  }
}
