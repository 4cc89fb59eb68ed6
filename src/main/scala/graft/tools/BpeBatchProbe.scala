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
  *
  * Modes (3rd arg):
  *  - "compare" (default): the original seq-vs-batched A/B above;
  *  - "curve": batched-only (maxBatch=16) at production-shaped round
  *    counts — trains to each milestone in `rounds` (comma-separated,
  *    e.g. "64,128,256,512") from scratch and prints wall, jobs,
  *    merges/job, wall-per-merge, and the localCheckpoint block
  *    footprint (RDD storage memory+disk at finish) — the measured
  *    confirmation that the lineage bound holds where persist /
  *    Dataset.localCheckpoint explode (BpeTrainer scaladoc);
  *  - "worst": the degenerate shared-symbol corpus (single-letter
  *    alphabet, every candidate pair overlaps), where batching cannot
  *    amortize and the trainer must degenerate gracefully to ~1
  *    merge/job — prices the adversarial floor.
  */
object BpeBatchProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val roundsArg = args.lift(1).getOrElse("50")
    val mode = args.lift(2).getOrElse("compare")
    val rounds = roundsArg.split(",")(0).toInt
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

    def curvePoint(label: String,
        d: org.apache.spark.sql.DataFrame, r: Int): String = {
      val t0 = System.nanoTime()
      val (m, t) = graft.ext.BpeTrainer.learnBpeBatched(
        d, "doc_id", tokens, r, maxBatch = 16)
      val learned = m.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val jobs = graft.ext.BpeTrainer.lastBatchedJobs.get()
      // localCheckpoint blocks live as cached RDD partitions: the
      // storage footprint the lineage-truncation strategy carries
      val storage = spark.sparkContext.getRDDStorageInfo
      val memMb = storage.map(_.memSize).sum / 1e6
      val diskMb = storage.map(_.diskSize).sum / 1e6
      t.unpersist()
      f"""{"milestone":"$label","rounds_asked":$r,"merges":$learned,""" +
        f""""wall_sec":$wall%.1f,"jobs":$jobs,""" +
        f""""merges_per_job":${learned.toDouble / math.max(1, jobs)}%.2f,""" +
        f""""wall_ms_per_merge":${wall * 1000 / math.max(1L, learned)}%.1f,""" +
        f""""ckpt_mem_kb":${memMb * 1000}%.0f,"ckpt_disk_kb":${diskMb * 1000}%.0f}"""
    }

    // wide-vocabulary corpus for production-shaped merge counts: the
    // sf0.1 documents' vocabulary collapses after ~89 merges (measured
    // — learnBpeBatched exhausts the pair table), so deep curves need
    // a corpus whose type table sustains them: 50k docs of 10
    // deterministic 8-hex-char "words" (md5 of a counter), Zipf-ish
    // reuse via the modulus
    lazy val wideDocs = {
      import spark.implicits._
      spark.range(50000).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 10).map(k =>
          substring(md5(((col("id") * 7 + k) % 20000).cast("string")),
            1, 8)): _*).as("text"))
    }

    mode match {
      case "curve" =>
        val milestones = roundsArg.split(",").map(_.trim.toInt).toSeq
        val points = milestones.map(r => curvePoint(s"x10@$r", docs, r))
        println(s"""{"metric":"bpe_curve","dir":"$dir","maxBatch":16,""" +
          s""""points":[${points.mkString(",")}]}""")
      case "curve-wide" =>
        val milestones = roundsArg.split(",").map(_.trim.toInt).toSeq
        val points = milestones.map(r => curvePoint(s"wide@$r", wideDocs, r))
        println(s"""{"metric":"bpe_curve_wide","vocab":20000,"maxBatch":16,""" +
          s""""points":[${points.mkString(",")}]}""")
      case "worst" =>
        // degenerate shared-symbol corpus: every word is a run of 'a',
        // so every candidate pair overlaps every other and each batch
        // can prove at most ~1 merge — the adversarial floor
        import spark.implicits._
        val degen = spark.range(5000).select(col("id").as("doc_id"),
          concat_ws(" ",
            org.apache.spark.sql.functions.transform(
              sequence(lit(1), lit(3)),
              k => repeat(lit("a"), (pmod(col("id") * k, lit(19)) + 2)
                .cast("int")))).as("text"))
        println(s"""{"metric":"bpe_worst",""" +
          s""""points":[${curvePoint("shared-symbol", degen, rounds)}]}""")
      case _ =>
        val (wallSeq, jobsSeq, mSeq) = run(maxBatch = 1)
        val (wallBat, jobsBat, mBat) = run(maxBatch = 16)
        require(mSeq == mBat,
          s"merge lists deviate:\n seq=${mSeq.take(5)}...\n bat=${mBat.take(5)}...")
        println(f"""{"metric":"bpe_batch_probe","dir":"$dir","rounds":${mSeq.size},""" +
          f""""seq":{"wall_sec":$wallSeq%.1f,"jobs":$jobsSeq,"merges_per_job":${mSeq.size.toDouble / jobsSeq}%.2f},""" +
          f""""batched":{"wall_sec":$wallBat%.1f,"jobs":$jobsBat,"merges_per_job":${mBat.size.toDouble / jobsBat}%.2f},""" +
          f""""speedup":${wallSeq / wallBat}%.2f,"identical_merges":true}""")
    }
    spark.stop()
  }
}
