package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — rewrite a parquet directory into files of
  * ~`targetBytes` each. The operational twin of PartMerge's manifest
  * union: a 100 TB corpus written by 100k tasks is 100k files, and
  * every later scan pays per-file open/footer/listing cost (plus
  * driver-side listing memory) for each one. Compacting to the
  * HDFS-block / object-store sweet spot (128 MB–1 GB) is routine
  * corpus hygiene.
  *
  * The file count is sized from the INPUT bytes (one filesystem
  * listing, no data pass — output bytes differ by re-encoding, and
  * ±one row group around the target is exactly the tolerance every
  * compactor accepts). Shrinking uses `coalesce`, which merges
  * partitions WITHOUT a shuffle — the whole rewrite is scan → write,
  * each output task reading a handful of input files; only a (rare)
  * grow uses `repartition`, which must shuffle to split data it
  * doesn't have. CompactionSpec pins both plan shapes and the file
  * counts.
  *
  * Reference: flat per-task parquet writes with no layout management
  * (/root/reference/cc2dataset/main.py:383-391); beyond-reference,
  * sibling to Bucketing / ZOrder / IVF-at-rest (layouts) — this one
  * manages file GRANULARITY rather than row placement.
  */
object Compaction {

  /** before/after file census; `filesAfter` is the layout contract
    * callers assert on. */
  final case class Stats(filesBefore: Int, bytesBefore: Long,
      filesAfter: Int, bytesAfter: Long)

  private def census(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    (parts.length, parts.map(_.getLen).sum)
  }

  /** The resize plan: merge without a shuffle, split with one, leave
    * alone otherwise. Package-visible so CompactionSpec can pin the
    * plan shape (zero exchanges on merge) without a write.
    */
  private[ops] def sizedFrame(df: DataFrame, n: Int,
      nBefore: Int): DataFrame =
    if (n < nBefore) df.coalesce(n) // merge: no shuffle
    else if (n > nBefore) df.repartition(n) // split: must shuffle
    else df

  /** Rewrite `inDir` (parquet) into `outDir` with ~`targetBytes` per
    * file. Returns the before/after census.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Stats = {
    require(targetBytes >= 1, "targetBytes must be >= 1")
    val (nBefore, bytesBefore) = census(spark, inDir)
    val n = math.max(1L,
      (bytesBefore + targetBytes - 1) / targetBytes).toInt
    sizedFrame(spark.read.parquet(inDir), n, nBefore)
      .write.mode("overwrite").parquet(outDir)
    val (nAfter, bytesAfter) = census(spark, outDir)
    Stats(nBefore, bytesBefore, nAfter, bytesAfter)
  }
}
