package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class AssemblySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("splitColumn covers every row, is deterministic, and validates cuts") {
    val df = (1L to 200L).toDF("id")
      .select(col("id"), Assembly.splitColumn(col("id"), "sp",
        Seq("train" -> 90, "val" -> 95), "test").as("split"))
    val counts = df.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 200L)
    assert(counts("train") > counts("val")) // 90% vs 5%
    // determinism: a second evaluation is identical
    val again = (1L to 200L).toDF("id")
      .select(Assembly.splitColumn(col("id"), "sp",
        Seq("train" -> 90, "val" -> 95), "test").as("split"))
      .collect().map(_.getString(0))
    assert(df.select("split").collect().map(_.getString(0)).toSeq ==
      again.toSeq)
    intercept[IllegalArgumentException] {
      Assembly.splitColumn(col("id"), "sp", Seq("a" -> 95, "b" -> 90), "c")
    }
  }

  test("weightedReplicas: whole weights replicate exactly, zero drops, fractions are deterministic") {
    val df = (1L to 100L).map(i => (i, if (i <= 10) 0L else if (i <= 50) 2000L else 1500L))
      .toDF("id", "wm")
    val out = Assembly.weightedReplicas(df, "id", col("wm"))
      .select(col("id"), col("replica")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // weight 0: gone
    assert((1L to 10L).forall(!byId.contains(_)))
    // weight 2.0: exactly replicas 0,1
    assert((11L to 50L).forall(byId(_) == Seq(0L, 1L)))
    // weight 1.5: replica 0 always; replica 1 for the deterministic half
    assert((51L to 100L).forall(id => byId(id).head == 0L))
    val extras = (51L to 100L).count(id => byId(id) == Seq(0L, 1L))
    assert(extras > 10 && extras < 40, s"fraction replicas way off: $extras")
    // deterministic: same extras on re-run
    val rerun = Assembly.weightedReplicas(df, "id", col("wm"))
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.view.mapValues(_.size.toLong).toMap == rerun)
  }

  test("topTerms ranks by tf desc, corpus df asc, token asc") {
    val docs = Seq(
      (1L, "x x x common rare"),
      (2L, "common common y rare"),
      (3L, "common z")).toDF("doc_id", "text")
    val got = Assembly.topTerms(docs, "doc_id", split(col("text"), " "), k = 2)
      .orderBy("doc_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    // doc 1: x tf=3; then rare (df 2) beats common (df 3). doc 2: common
    // tf=2 first, then y (df 1, unique to doc 2) beats rare (df 2).
    assert(got.toSeq == Seq(
      (1L, 1L, "x", 3L, 1L), (1L, 2L, "rare", 1L, 2L),
      (2L, 1L, "common", 2L, 3L), (2L, 2L, "y", 1L, 1L),
      (3L, 1L, "z", 1L, 1L), (3L, 2L, "common", 1L, 3L)))
  }

  test("splitColumn rejects duplicate and out-of-range cuts") {
    // duplicate cut -> 'b' unreachable
    intercept[IllegalArgumentException] {
      Assembly.splitColumn(col("id"), "sp", Seq("a" -> 90, "b" -> 90), "c")
    }
    // 0 never matches (pct >= 0 is the floor)
    intercept[IllegalArgumentException] {
      Assembly.splitColumn(col("id"), "sp", Seq("a" -> 0), "c")
    }
    // 100 starves `last` entirely
    intercept[IllegalArgumentException] {
      Assembly.splitColumn(col("id"), "sp", Seq("a" -> 100), "c")
    }
  }

  test("topTerms df is combinable aggregation; only the per-doc rank window remains") {
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val plan = Assembly.topTerms(docs, "doc_id", split(col("text"), " "), 2)
      .queryExecution.executedPlan.toString
    assert("Window \\[".r.findAllIn(plan).size === 1,
      s"expected exactly one window (the per-doc rank):\n${plan.take(2000)}")
    assert(plan.contains("partial_count"),
      "token document frequency should plan a map-side partial count")
  }

  test("normalizeText lowercases, strips controls, collapses spaces, trims") {
    val got = Seq("  Hello\tWORLD   x\n\n ", "ok").toDF("t")
      .select(TextAnalysis.normalizeText(col("t")).as("n"))
      .as[String].collect().toSeq
    assert(got == Seq("hello world x", "ok"))
  }

  test("prioritySample matches the driver-side priority formula and drops weight<=0") {
    def h32(s: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(8), 16)
    val rows = (1L to 200L).map(i =>
      (i, if (i % 7 == 0) 0L else 10L + (i % 13) * 100L))
    val want = rows.filter(_._2 > 0)
      .map { case (id, w) =>
        (id, w, (w * (1L << 32)) / (h32(s"ps|$id") + 1)) }
      .sortBy { case (id, _, p) => (-p, id) }
      .take(20)
    val got = Assembly.prioritySample(rows.toDF("doc_id", "w"),
      "doc_id", col("w"), k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // determinism across evaluations
    val again = Assembly.prioritySample(rows.toDF("doc_id", "w"),
      "doc_id", col("w"), k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again == got)
  }

  test("prioritySample survives weights >= 2^31 milli (decimal multiply)") {
    // byte-length-weighted corpora can exceed 2^31 milli; the old int64
    // multiply (w * 2^32) wrapped/threw here. The decimal(38,0) product
    // is exact; reference computed in BigInt.
    def h32(s: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(8), 16)
    val rows = Seq((1L, 3000000000L), (2L, (1L << 31) - 1), (3L, 1L << 31),
      (4L, 5000000000L), (5L, 42L))
    val want = rows
      .map { case (id, w) =>
        (id, w,
          ((BigInt(w) * BigInt(1L << 32)) / BigInt(h32(s"ps|$id") + 1))
            .toLong) }
      .sortBy { case (id, _, p) => (-p, id) }
      .take(3)
    val got = Assembly.prioritySample(rows.toDF("doc_id", "w"),
      "doc_id", col("w"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }
}
