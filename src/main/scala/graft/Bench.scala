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
  *
  * Two outputs:
  *  - `tools/bench_full_latest.json` (repo-anchored): the COMPLETE
  *    artifact — per-query wall + process-CPU seconds, per-pass
  *    [wall, cpu] pairs, failures. The harness that records the stdout
  *    of this main keeps only a bounded tail, which clipped the first
  *    half of a 103-query map; a file the harness can't truncate is the
  *    canonical record, and `tools/check_bench.py` follows the stdout
  *    line's "sidecar" pointer to it.
  *  - stdout: ONE SHORT JSON line (totals + the slowest queries +
  *    sidecar path) sized to survive the tail clip and stay parseable.
  *
  * CPU seconds are whole-process (OperatingSystemMXBean.getProcessCpuTime
  * deltas — all 32 executor threads + GC). In local mode that makes
  * host contention decidable from the artifact alone: a contended run
  * inflates wall while CPU stays at the quiet-host level (the work is
  * the same, the host just schedules it late), whereas a plan regression
  * inflates both together.
  */
object Bench {

  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]

  /** Process CPU time in seconds (monotonic; -1 if unavailable). */
  private def cpuSec(): Double = osBean.getProcessCpuTime / 1e9

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
    // the warmup prelude must never kill the run: a fixture-schema drift
    // here (r8: events.ts changed physical type under us) would otherwise
    // zero the ENTIRE artifact instead of failing the affected queries,
    // which the timed loop already reports per-query
    def warmTouch(what: String)(body: => Unit): Unit =
      try body catch {
        case e: Throwable =>
          System.err.println(s"[bench] warmup touch $what failed: $e")
      }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      warmTouch(t)(spark.read.parquet(s"$sfDir/$t.parquet").count())
    }
    warmTouch("events")(graft.queries.QueryUtil.events(spark, sfDir).count())
    // materialize synthetic WAT fixtures outside the timed window — on a
    // cold container generation would otherwise inflate the first
    // extraction query's number
    warmTouch("wat-fleet")(graft.wat.WatFixture.ensureFleet())
    warmTouch("wat-single")(graft.wat.WatFixture.ensureSingle())
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
      // each pass records (wall, processCpu) seconds
      val times: Seq[(Double, Double)] = (1 to passes).flatMap { _ =>
        val c0 = cpuSec()
        val t0 = System.nanoTime()
        // toRdd.count() materializes every output column through the full
        // physical plan; a plain .count() would let Catalyst prune the
        // projection (e.g. the md5 uid in q_wat_extract becomes dead code)
        // and under-report real full-row cost
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Some(((System.nanoTime() - t0) / 1e9, cpuSec() - c0))
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
    // headline per query = min-wall pass (a transient contention spike
    // lands on one pass, the min is steady-state); every pass's
    // [wall, cpu] is ALSO emitted so a reader can separate contention
    // (pass variance, wall up with cpu flat) from plan regression (all
    // passes slow in both). A query with zero successful passes reports
    // null, never 0.0 — a 0.0 would read as a huge speedup to a baseline
    // comparator instead of a failure.
    def f3(v: Double) = f"$v%.3f"
    val best = results.map { case (k, ts) =>
      (k, ts.minByOption(_._1)) // the min-WALL pass, with its cpu
    }
    val qs = best.map { case (k, b) =>
      "\"" + k + "\":" + b.map(p => f3(p._1)).getOrElse("null")
    }.mkString("{", ",", "}")
    val cpuJson = best.map { case (k, b) =>
      "\"" + k + "\":" + b.map(p => f3(p._2)).getOrElse("null")
    }.mkString("{", ",", "}")
    val passJson = results.map { case (k, ts) =>
      "\"" + k + "\":" +
        ts.map(p => s"[${f3(p._1)},${f3(p._2)}]").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = best.flatMap(_._2.map(_._1)).sum
    val cpuTotal = best.flatMap(_._2.map(_._2)).sum

    // canonical artifact: the full per-query map, written where the
    // stdout-tail clip can't reach it (repo-anchored, committed per round)
    val sidecarRel = "tools/bench_full_latest.json"
    val full = s"""{"metric":"total","value":${f3(total)},"unit":"sec","cpu_sec":${f3(cpuTotal)},"queries":$qs,"cpu":$cpuJson,"passes":$passJson,"failed":$failedJson,"sf":"$sfDir"}"""
    val sidecar = new java.io.File(graft.wat.WatFixture.repoRoot, sidecarRel)
    try {
      java.nio.file.Files.write(sidecar.toPath,
        (full + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $sidecar: $e")
    }

    // stdout: short enough to survive a bounded tail capture — totals,
    // failures, and the slowest queries only; the sidecar has everything
    val slowest = best.collect { case (k, Some((w, _))) => (k, w) }
      .sortBy(-_._2).take(12)
      .map { case (k, w) => "\"" + k + "\":" + f3(w) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","cpu_sec":${f3(cpuTotal)},"nq":${results.size},"slowest":$slowest,"sidecar":"$sidecarRel","failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
