package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Dedup survivor-selection parity: the hot-key-safe `firstPerKeyAgg`
  * (combinable min_by aggregation) must pick bit-identical survivors to
  * the window-based `firstPerKey` — including on a DEGENERATE key where
  * ~every row shares one value, the distribution that makes the window
  * variant a single-task sort at scale.
  */
class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("firstPerKeyAgg matches firstPerKey on a degenerate hot key") {
    // 990 of 1000 rows share one key; survivor must be the min ord row
    val df = (1L to 1000L)
      .map(i => (if (i <= 990) "hot" else s"k$i", 1001L - i, s"v$i"))
      .toDF("key", "ord", "v")
    val viaWindow = Dedup.firstPerKey(df, Seq(col("key")), Seq(col("ord")))
      .orderBy("key").collect().toSeq
    val viaAgg = Dedup.firstPerKeyAgg(df, Seq(col("key")), Seq(col("ord")))
      .orderBy("key").collect().toSeq
    assert(viaAgg === viaWindow)
    assert(viaAgg.size === 11)
    // the hot key's survivor is the global ord minimum (i=990 -> ord=11)
    val hot = viaAgg.find(_.getString(0) == "hot").get
    assert(hot.getLong(1) === 11L && hot.getString(2) === "v990")
  }

  test("firstPerKeyAgg plans a combinable min_by, never a row_number window") {
    val df = Seq(("a", 1L, "x")).toDF("key", "ord", "v")
    val plan = Dedup.firstPerKeyAgg(df, Seq(col("key")), Seq(col("ord")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min_by"),
      s"expected map-side partial min_by:\n${plan.take(2000)}")
    assert(!plan.contains("row_number"))
  }

  test("firstPerKeyAgg equals firstPerKey on random data") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      // uniq makes the tie-break total, so both variants are
      // deterministic and must agree row-for-row
      val rows = (1 to 300).map(i =>
        (s"k${rnd.nextInt(8)}", rnd.nextInt(20).toLong, i.toLong))
      val df = rows.toDF("key", "ord", "uniq")
      def dump(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val viaWindow = dump(Dedup.firstPerKey(df, Seq(col("key")),
        Seq(col("ord"), col("uniq"))))
      val viaAgg = dump(Dedup.firstPerKeyAgg(df, Seq(col("key")),
        Seq(col("ord"), col("uniq"))))
      assert(viaAgg == viaWindow, s"trial $trial")
    }
  }

  test("multi-column tie-break orders lexicographically like the window variant") {
    val df = Seq(
      ("k", 2L, 1L, "a"), ("k", 1L, 9L, "b"), ("k", 1L, 3L, "c"))
      .toDF("key", "o1", "o2", "v")
    val got = Dedup.firstPerKeyAgg(df, Seq(col("key")),
      Seq(col("o1"), col("o2"))).collect()
    assert(got.length === 1 && got(0).getString(3) === "c")
  }

  test("firstPerKeyAgg rejects inputs that collide with its __row scratch name") {
    val clash = Seq(("k", 1L)).toDF("key", "__row")
    val e = intercept[IllegalArgumentException] {
      Dedup.firstPerKeyAgg(clash, Seq(col("key")), Seq(col("__row")))
    }
    assert(e.getMessage.contains("__row"))
    // duplicate column names (the post-join hazard) are rejected too
    val a = Seq(("k", 1L)).toDF("key", "v")
    val dup = a.select(col("key"), col("v"), col("v"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.firstPerKeyAgg(dup, Seq(col("key")), Seq(lit(1)))
    }
    assert(e2.getMessage.contains("duplicate"))
  }
}
