package graft.tools

import org.apache.spark.sql.SparkSession

/** Durable bucketed-layout catalog, demonstrated across JVMs: with a
  * derby-backed HIVE metastore (jars ship with Spark), a bucketed
  * layout written in one JVM is a first-class catalog table in the
  * next — `Bucketing.ensureBucketed`'s `tableExists` short-circuit
  * fires and the CREATE TABLE re-registration dance never runs.
  *
  * Run as two separate processes (that is the point):
  *   sbt "runMain graft.tools.MetastoreProbe write"
  *   sbt "runMain graft.tools.MetastoreProbe read"
  * `read` exits 0 only if the FRESH JVM sees both tables in the
  * catalog without any ensure/registration AND the bucketed join plans
  * with zero exchanges and zero sorts (the legacy outputOrdering flag
  * is still required for sort-free scans — measured: without it the
  * single-file-per-bucket SMJ re-sorts both sides even on Spark 4.1;
  * the metastore removes the REGISTRATION dependency, not the flag).
  *
  * Why the battery's default stays in-memory + re-registration: the
  * embedded derby metastore takes a SINGLE-PROCESS lock, so concurrent
  * battery/probe JVMs (bench beside a scale probe, parallel test
  * forks) would serialize or fail on the metastore where today they
  * share nothing. A production deployment has a shared metastore
  * (HMS/Glue) with none of that constraint — there, ensureBucketed's
  * tableExists short-circuit gives exactly the behavior this probe
  * demonstrates, and the re-registration path is dead code that only
  * ever runs against catalog amnesia.
  */
object MetastoreProbe {

  private def session(): SparkSession = {
    val root = new java.io.File(
      graft.wat.WatFixture.repoRoot, "target/graft-hive-demo")
    root.mkdirs()
    SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.warehouse.dir",
        new java.io.File(root, "warehouse").getAbsolutePath)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${new java.io.File(root, "metastore_db").getAbsolutePath};create=true")
      .config("spark.sql.catalogImplementation", "hive")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("write")
    val spark = session()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    mode match {
      case "write" =>
        graft.ops.Bucketing.writeBucketed(
          spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select("l_orderkey", "l_extendedprice"),
          "graft_ms_li", "l_orderkey", 4)
        graft.ops.Bucketing.writeBucketed(
          spark.read.parquet(s"$sfDir/orders.parquet")
            .select("o_orderkey", "o_orderpriority"),
          "graft_ms_or", "o_orderkey", 4)
        println("[metastore-probe] write: tables landed under the hive catalog")
      case "read" =>
        val known = spark.catalog.tableExists("graft_ms_li") &&
          spark.catalog.tableExists("graft_ms_or")
        // ensureBucketed must be a PURE no-op here (tableExists branch)
        graft.ops.Bucketing.ensureBucketed(
          spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select("l_orderkey", "l_extendedprice"),
          "graft_ms_li", "l_orderkey", 4)
        val j = graft.ops.Bucketing.bucketedEquiJoin(spark,
          "graft_ms_li", "graft_ms_or", "l_orderkey", "o_orderkey")
        val plan = j.queryExecution.executedPlan
        val sorts = plan.collectWithSubqueries {
          case s: org.apache.spark.sql.execution.SortExec => s }.size
        val exch = plan.collectWithSubqueries {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
        val n = j.count()
        println(s"[metastore-probe] read: catalogKnows=$known " +
          s"exchanges=$exch sorts=$sorts rows=$n " +
          (if (known && exch == 0 && sorts == 0 && n > 0) "PASS" else "FAIL"))
        if (!(known && exch == 0 && sorts == 0 && n > 0)) sys.exit(1)
      case other =>
        System.err.println(s"unknown mode $other (write|read)")
        sys.exit(2)
    }
    spark.stop()
  }
}
