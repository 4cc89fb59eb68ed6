package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SnapshotDiffSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("diff classifies added/removed/changed/same; summary rolls up") {
    val v1 = Seq((1L, "aa"), (2L, "bb"), (3L, "cc")).toDF("id", "fp")
    val v2 = Seq((2L, "bb"), (3L, "cc2"), (4L, "dd")).toDF("id", "fp")
    val got = SnapshotDiff.diff(v1, v2, "id", "fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
    val sum = SnapshotDiff.diffSummary(v1, v2, "id", "fp")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map(
      "removed" -> 1L, "same" -> 1L, "changed" -> 1L, "added" -> 1L))
  }

  test("identical snapshots are all-same; disjoint snapshots split add/remove") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "fp")
    assert(SnapshotDiff.diff(a, a, "id", "fp")
      .collect().forall(_.getString(1) == "same"))
    val b = Seq((3L, "z")).toDF("id", "fp")
    val sum = SnapshotDiff.diffSummary(a, b, "id", "fp")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("removed" -> 2L, "added" -> 1L))
  }
}
