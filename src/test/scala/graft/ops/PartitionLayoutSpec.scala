package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Hive-style partitioned layout: `write.partitionBy(col)` routes rows
  * into one directory per value, and reads filtered on that column
  * prune whole directories at PLANNING time — the 100 TB pattern for
  * the coarse access dimensions (language, date, crawl id): a
  * single-language job touches 1/N of the corpus without any index.
  */
class PartitionLayoutSpec extends AnyFunSuite with SparkTestBase {

  test("partitionBy layout prunes non-matching partitions at the scan") {
    val out = Files.createTempDirectory("part-layout").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(out)

    val langs = spark.read.parquet(out).select("lang").distinct()
      .collect().map(_.getString(0)).sorted
    assert(langs.length > 1, "fixture must have several languages")

    val one = spark.read.parquet(out).where(col("lang") === langs.head)
    val plan = one.queryExecution.executedPlan.toString
    // the lang predicate must land in PartitionFilters, not a row filter
    assert(plan.contains("PartitionFilters") &&
      plan.contains(s"isnotnull(lang"), s"no partition filter in:\n$plan")

    // PROVE pruning via the scan's own metrics: files read == files in
    // the one matching directory, not the whole dataset. (Checking
    // input_file_name() over surviving rows would be vacuous — a
    // post-scan row filter also never shows foreign files.)
    import org.apache.spark.sql.execution.FileSourceScanExec
    // execute THIS queryExecution (count() would build a fresh plan
    // whose metrics are separate), then read its scan's metrics
    val qe = one.queryExecution
    qe.toRdd.count()
    val scan = qe.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    val filesInMatchingDir = new java.io.File(s"$out/lang=${langs.head}")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val totalFiles = langs.map(l => new java.io.File(s"$out/lang=$l")
      .listFiles().count(_.getName.endsWith(".parquet"))).sum
    val scannedFiles = scan.metrics("numFiles").value
    assert(scannedFiles == filesInMatchingDir && scannedFiles < totalFiles,
      s"scan read $scannedFiles files; matching dir has $filesInMatchingDir of $totalFiles")

    // counts are partition-complete: sum over partitions == total
    val total = spark.read.parquet(out).count()
    val perLang = langs.map(l =>
      spark.read.parquet(out).where(col("lang") === l).count()).sum
    assert(perLang == total)
  }
}
