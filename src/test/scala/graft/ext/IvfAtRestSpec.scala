package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The "at 100 TB the assignment is a bucketed write and probes prune
  * to one bucket" claim in Similarity's scaladoc, demonstrated: the
  * assigned corpus written cell-partitioned, a static cell predicate
  * pruning the file listing, the ivfTopK join form dynamically pruning
  * through the broadcast query set, and both probe paths bit-identical
  * to the in-memory index.
  */
class IvfAtRestSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val prepared = Similarity.prepared(
    spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id", "embedding")
  private lazy val assigned =
    Similarity.ivfAssign(prepared, prepared.where(col("vec_id") < 8))
  private lazy val dir = {
    val d = Files.createTempDirectory("ivf_at_rest").toString
    Similarity.writeAssignedPartitioned(assigned, d)
    d
  }

  test("the write lays one directory per cell") {
    val cells = assigned.select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
      .map(_.stripPrefix("cell=").toLong).toSet
    assert(dirs == cells, s"expected one partition dir per cell")
  }

  test("a static cell predicate prunes the scan to one partition") {
    val k = assigned.select("cell").distinct()
      .orderBy("cell").first().getLong(0)
    val one = Similarity.readAssigned(spark, dir)
      .where(col("cell") === k)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") &&
      "\\(cell#\\d+ = ".r.findFirstIn(plan).isDefined,
      s"the cell predicate must land in PartitionFilters:\n${plan.take(1500)}")
    // pruned listing: only the one cell directory's files are read
    val scanned = one.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount
    }
    assert(scanned == Seq(1),
      s"expected exactly 1 selected partition, got $scanned")
    assert(one.count() == assigned.where(col("cell") === k).count())
  }

  test("the ivfTopK probe join dynamically prunes to the probed cells") {
    val atRest = Similarity.readAssigned(spark, dir)
    val topk = Similarity.ivfTopK(atRest, col("vec_id").between(8, 12), k = 2)
    val rows = topk.collect() // DPP resolves at execution
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      "the cell equi-join against the broadcast query set must plan " +
        s"dynamic partition pruning:\n${plan.take(2000)}")
    // and the at-rest probe is bit-identical to the in-memory index
    val mem = Similarity.ivfTopK(assigned, col("vec_id").between(8, 12),
      k = 2).collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      mem.map(_.toString).sorted.toSeq)
  }
}
