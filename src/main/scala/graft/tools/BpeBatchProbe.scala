package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE training beyond toy rounds: the per-merge driver round-trip was
  * the documented scale boundary with no measured curve. This probe
  * trains `rounds` merges over the ×10 corpus (sf0.1 documents) twice
  * with the batched trainer — maxBatch=1 (the sequential regime: one
  * pair-count job + one rebuild job per merge, lineage-truncated) vs
  * maxBatch=16 — and prints wall, jobs, and merges/job for each. Both
  * runs produce the IDENTICAL merge list (learnBpeBatched is proven
  * sequential-exact, BpeTrainerSpec), so the delta is pure round-trip
  * amortization: the quantity that decides whether a 50k-merge
  * production vocabulary is a day or a month of driver round-trips.
  *
  * Run:  sbt "runMain graft.tools.BpeBatchProbe /root/testdata/sf0.1 50"
  */
object BpeBatchProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tokens = split(col("text"), " ")

    def run(maxBatch: Int): (Double, Long, Seq[(Long, String, String, Long)]) = {
      val t0 = System.nanoTime()
      val (m, t) = graft.ext.BpeTrainer.learnBpeBatched(
        docs, "doc_id", tokens, rounds, maxBatch)
      val merges = m.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      t.unpersist()
      ((System.nanoTime() - t0) / 1e9,
        graft.ext.BpeTrainer.lastBatchedJobs.get(), merges)
    }

    val (wallSeq, jobsSeq, mSeq) = run(maxBatch = 1)
    val (wallBat, jobsBat, mBat) = run(maxBatch = 16)
    require(mSeq == mBat,
      s"merge lists deviate:\n seq=${mSeq.take(5)}...\n bat=${mBat.take(5)}...")
    println(f"""{"metric":"bpe_batch_probe","dir":"$dir","rounds":${mSeq.size},""" +
      f""""seq":{"wall_sec":$wallSeq%.1f,"jobs":$jobsSeq,"merges_per_job":${mSeq.size.toDouble / jobsSeq}%.2f},""" +
      f""""batched":{"wall_sec":$wallBat%.1f,"jobs":$jobsBat,"merges_per_job":${mBat.size.toDouble / jobsBat}%.2f},""" +
      f""""speedup":${wallSeq / wallBat}%.2f,"identical_merges":true}""")
    spark.stop()
  }
}
