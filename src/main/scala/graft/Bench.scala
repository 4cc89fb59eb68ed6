package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR,
  * one JSON line. Warmup runs table counts plus EVERY query once at
  * SPARK_GRAFT_WARM_DIR (default sf0.001) through the same toRdd sink,
  * pulling session init, file listing, and per-query whole-stage-codegen
  * compilation out of the timed pass so the numbers reflect steady-state
  * execution. Each query then reports the MIN over
  * SPARK_GRAFT_BENCH_PASSES (default 2) timed runs, so a transient
  * host-contention spike can't masquerade as a plan regression.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every fixture table, then run EVERY query once at
    // the smallest scale — whole-stage codegen compiles per generated
    // class, so the timed pass measures steady-state execution instead
    // of charging each query its one-time janino compile (~1-2 s for the
    // biggest plans)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    graft.queries.QueryUtil.events(spark, sfDir).count()
    // materialize synthetic WAT fixtures outside the timed window — on a
    // cold container generation would otherwise inflate the first
    // extraction query's number
    graft.wat.WatFixture.ensureFleet()
    graft.wat.WatFixture.ensureSingle()
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, warmDir).queryExecution.toRdd.count()
      catch {
        case e: Throwable =>
          // a silently-skipped warmup would re-absorb janino compile
          // costs into the timed numbers — say so
          System.err.println(s"[bench] warmup $name failed ($warmDir): $e")
      }
    }

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // each query is timed as the MIN of `passes` runs: a transient
    // CPU-contention spike on the bench host (observed 2-20x inflation on
    // individual queries in shared-machine runs) lands on one pass, not
    // both, and the min reports the query's real steady-state cost
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to passes).flatMap { _ =>
        val t0 = System.nanoTime()
        // toRdd.count() materializes every output column through the full
        // physical plan; a plain .count() would let Catalyst prune the
        // projection (e.g. the md5 uid in q_wat_extract becomes dead code)
        // and under-report real full-row cost
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          if (!failed.contains(name)) {
            failed += name
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          None
        }
      }
      (name, times)
    }
    // headline per query = min over passes (a transient contention spike
    // lands on one pass, the min is steady-state); every pass time is
    // ALSO emitted so a reader can separate contention (pass variance)
    // from plan regression (all passes slow). A query with zero
    // successful passes reports null, never 0.0 — a 0.0 would read as a
    // huge speedup to a baseline comparator instead of a failure.
    val qs = results.map { case (k, ts) =>
      "\"" + k + "\":" + (if (ts.isEmpty) "null" else ts.min.toString)
    }.mkString("{", ",", "}")
    val passJson = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap { case (_, ts) => ts.minOption }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passJson,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
