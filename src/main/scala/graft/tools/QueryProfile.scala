package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage empirical profiler for a named query (optimization guide
  * §1.1: find WHERE the time goes before touching anything). Runs the
  * named queries once at SPARK_GRAFT_WARM_DIR (codegen warmup), then
  * once at SPARK_GRAFT_SF_DIR under a stage listener, and prints every
  * stage's wall duration, task count, executor-run/CPU totals and
  * shuffle bytes, plus the job count — the number that dominates
  * iterative tiny-data queries where per-job/stage scheduling overhead,
  * not data, is the cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.QueryProfile q_ann_pq_recall ..."
  */
object QueryProfile {

  private final case class StageRow(jobId: Int, stageId: Int, name: String,
      numTasks: Int, wallMs: Long, runMs: Long, cpuMs: Long,
      shReadMB: Double, shWriteMB: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        graft.SessionBuilder.ExcludedOptimizerRules)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // streaming checkpoints in this battery are per-run scratch (wiped
      // at entry, never resumed); Spark 4.1's per-file checkpoint
      // checksum writes park every state-store commit on an async
      // future (thread-dump evidence in OPTIMIZATION_r21.md) — disable
      // for battery sessions; durable production checkpoints keep it
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        "false")
      // local scratch checkpoints: FileSystem-based manager (File.renameTo,
      // no per-rename shell fork — see StreamQueries.withStreamWidth)
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing" +
          ".FileSystemBasedCheckpointFileManager")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stageToJob = mutable.Map.empty[Int, Int]
    val rows = mutable.ArrayBuffer.empty[StageRow]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs += 1
        js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(0L)
        val m = si.taskMetrics
        rows += StageRow(stageToJob.getOrElse(si.stageId, -1), si.stageId,
          si.name.linesIterator.next().take(90), si.numTasks, wall,
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6)
      }
    }

    graft.wat.WatFixture.ensureFleet()
    graft.wat.WatFixture.ensureSingle()
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup: codegen compile + fixture generation out of the numbers
      try fn(spark, warmDir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        System.err.println(s"[profile] warmup $name failed: $e") }
      // a first sf0.1 pass too, mirroring bench min-of-2 steady state
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => () }

      rows.clear(); stageToJob.clear(); jobs = 0
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let the listener bus drain before reading (private API — poll)
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)

      println(f"%n===== $name: wall=$wall%.3f s, jobs=$jobs, stages=${rows.size} =====")
      println(f"${"job"}%4s ${"stage"}%6s ${"tasks"}%5s ${"wallMs"}%7s " +
        f"${"runMs"}%7s ${"cpuMs"}%7s ${"shRdMB"}%8s ${"shWrMB"}%8s  name")
      rows.sortBy(-_.wallMs).foreach { r =>
        println(f"${r.jobId}%4d ${r.stageId}%6d ${r.numTasks}%5d " +
          f"${r.wallMs}%7d ${r.runMs}%7d ${r.cpuMs}%7d " +
          f"${r.shReadMB}%8.2f ${r.shWriteMB}%8.2f  ${r.name}")
      }
      val totWall = rows.map(_.wallMs).sum
      println(f"stage wall sum=${totWall / 1000.0}%.3f s " +
        f"(gaps = driver/planning = ${wall - totWall / 1000.0}%.3f s)")
    }
    spark.stop()
  }
}
