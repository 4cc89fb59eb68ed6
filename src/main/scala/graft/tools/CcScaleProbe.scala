package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Clustering
import graft.ext.Clustering.CcStrategy

/** Connected-components scale adversary — the SCALING.md evidence
  * behind the min-label vs alternating-star crossover the
  * Clustering scaladoc asserts (min-label: rounds = diameter, two
  * cheap shuffles per round; alternating-star: O(log² n) rounds
  * regardless of diameter, at an edge-rewrite + set-equality cost per
  * round).
  *
  * Two pair-graph shapes, both closed-form deterministic:
  *  - QUASI-CLIQUE (the shape near-dup graphs actually take —
  *    components are groups of documents that all share LSH buckets):
  *    components of 32 nodes, each a ring + chords (diameter ≤ ~4);
  *    n scales with the factor.
  *  - LONG PATH (the adversarial shape): one path of n nodes —
  *    diameter n-1, min-label's worst case by construction.
  *
  * For each (shape, size, strategy): rounds to converge, wall seconds,
  * and cumulative shuffle write during the run (the scale currency).
  * Min-label on paths is priced only while affordable (rounds = path
  * length; the probe caps it and records the projection instead of
  * burning hours proving linearity twice).
  *
  * Run: sbt "runMain graft.tools.CcScaleProbe [factor]" — factor
  * scales the quasi-clique corpus (default decades 1/10/100 are all
  * run when no factor is given).
  */
object CcScaleProbe {

  /** Ring + two chords per node inside 32-node components: diameter
    * stays ≤ ~4 at any n (each node reaches the component hub in one
    * or two hops through the chord to the (i*7)%32 slot).
    */
  private def quasiClique(spark: SparkSession, n: Long): DataFrame = {
    val base = spark.range(n)
      .select(col("id"), (col("id") / 32).cast("long").as("comp"),
        pmod(col("id"), lit(32L)).as("slot"))
    base.select(col("id").as("d1"),
        (col("comp") * 32 + pmod(col("slot") + 1, lit(32L))).as("d2"))
      .union(base.select(col("id").as("d1"),
        (col("comp") * 32 + pmod(col("slot") * 7 + 3, lit(32L))).as("d2")))
      .where(col("d1") =!= col("d2") && col("d2") < n)
  }

  /** One path 0-1-2-...-(n-1): diameter n-1. */
  private def longPath(spark: SparkSession, n: Long): DataFrame =
    spark.range(n - 1).select(col("id").as("d1"), (col("id") + 1).as("d2"))

  private final class ShuffleListener
      extends org.apache.spark.scheduler.SparkListener {
    val written = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null && m.shuffleWriteMetrics != null)
        written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  private def run(name: String, pairs: DataFrame, strategy: CcStrategy,
      maxIters: Int, listener: ShuffleListener): Unit = {
    val spark = pairs.sparkSession
    var rounds = -1
    val before = listener.written.get
    val t0 = System.nanoTime()
    val result =
      try {
        val cc = Clustering.connectedComponents(pairs, maxIters = maxIters,
          strategy = strategy, onRounds = rounds = _)
        val agg = cc.agg(count(lit(1)), countDistinct(col("cluster_id")))
          .head()
        s"nodes=${agg.getLong(0)} comps=${agg.getLong(1)}"
      } catch {
        case e: IllegalStateException => s"DNF(${e.getMessage.take(40)}...)"
      }
    val wall = (System.nanoTime() - t0) / 1e9
    // settle the listener bus so the run's last tasks are counted
    // (listenerBus is private[spark]; a short sleep is the probe-grade
    // equivalent, same as ScaleProbe's snapshot settle)
    Thread.sleep(300)
    val shuffleMb = (listener.written.get - before) / 1e6
    println(f"$name%-42s rounds=$rounds%4d wall=$wall%8.2fs " +
      f"shuffleWrite=$shuffleMb%10.1f MB  $result")
  }

  def main(args: Array[String]): Unit = {
    val factors: Seq[Long] = args.headOption.filter(_.forall(_.isDigit))
      .map(f => Seq(f.toLong)).getOrElse(Seq(1L, 10L, 100L))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("cc-scale-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new ShuffleListener
    spark.sparkContext.addSparkListener(listener)

    for (f <- factors) {
      val n = 10000L * f
      val qc = quasiClique(spark, n)
      run(s"quasi-clique n=$n minlabel", qc, CcStrategy.MinLabel, 25,
        listener)
      run(s"quasi-clique n=$n star", qc, CcStrategy.AlternatingStar, 25,
        listener)
    }
    // the adversarial decade sweep: path length doubles; min-label's
    // rounds (and wall) double with it while star's stay ~log²
    for (len <- Seq(64L, 128L, 256L)) {
      val p = longPath(spark, len)
      run(s"long-path n=$len minlabel", p, CcStrategy.MinLabel,
        len.toInt + 2, listener)
      run(s"long-path n=$len star", p, CcStrategy.AlternatingStar, 25,
        listener)
    }
    // at scale, min-label on a long path is priced by PROJECTION: its
    // per-round cost is flat (measure 3 capped rounds), rounds = n-1
    for (len <- Seq(100000L, 1000000L)) {
      val p = longPath(spark, len)
      run(s"long-path n=$len minlabel(cap=3 rounds, DNF expected)", p,
        CcStrategy.MinLabel, 3, listener)
      run(s"long-path n=$len star", p, CcStrategy.AlternatingStar, 30,
        listener)
    }
    spark.stop()
  }
}
