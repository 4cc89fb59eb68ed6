package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** FuzzyJoin's whole claim is LOSSLESS blocking: every test compares
  * the blocked join against an in-memory brute-force all-pairs scan.
  * Any missed pair is a broken prefix filter, any extra a broken
  * verifier.
  */
class FuzzyJoinSpec extends AnyFunSuite with SparkTestBase {

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def brute(rows: Seq[(Long, String)], d: Int) =
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2 && lev(s1, s2) <= d
    } yield (i1, i2, lev(s1, s2).toLong)).toSet

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("s", StringType, nullable = false)))

  private def run(rows: Seq[(Long, String)], d: Int, q: Int = 2) = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 4),
      schema)
    FuzzyJoin.selfPairs(df, "id", "s", d, q)
      .select("id1", "id2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("random corpus matches brute force at d=1 and d=2") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcd"
    val base = (0L until 120L).map { i =>
      i -> Seq.fill(4 + rnd.nextInt(5))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    for (d <- Seq(1, 2))
      assert(run(base, d) == brute(base, d), s"d=$d")
  }

  test("universal shared prefix stays exact (the blocking adversary)") {
    // every string opens with the same 12 chars — frequency ordering
    // must keep the prefix grams out of the blocks, and recall must
    // still be 1.0
    val rnd = new scala.util.Random(7)
    val rows = (0L until 80L).map { i =>
      i -> ("https://www." + Seq.fill(3)("ab" (rnd.nextInt(2))).mkString)
    }
    for (d <- Seq(1, 2))
      assert(run(rows, d) == brute(rows, d), s"d=$d")
  }

  test("exact duplicates pair at distance 0") {
    val rows = Seq(1L -> "hello", 2L -> "hello", 3L -> "help")
    val got = run(rows, 1)
    assert(got == brute(rows, 1))
    assert(got.contains((1L, 2L, 0L)))
  }

  test("ID-like corpus (uniform format, bounded alphabet) stays exact") {
    // the value-only-blocking adversary: every string is
    // "Name#0000NNN" — a tiny shared gram alphabet where value blocks
    // grow linearly with the corpus. Positional blocking must keep
    // recall 1.0 AND the candidate count near the output scale.
    val rows = (0L until 300L).map(i => i -> f"Name#${i % 250}%07d")
    for (d <- Seq(1, 2))
      assert(run(rows, d) == brute(rows, d), s"d=$d")
  }

  test("position-shifting edits (indels) stay exact") {
    // an insertion shifts every later gram by one position — the
    // |Δpos| ≤ d tolerance must absorb exactly that, at both d values
    val base = "abcdefghijklmn"
    val rows = Seq(
      1L -> base,
      2L -> ("X" + base),          // insert at front: all grams shift +1
      3L -> base.drop(1),          // delete at front: all grams shift -1
      4L -> (base.take(7) + "ZZ" + base.drop(7)), // double mid insert
      5L -> ("XY" + base))         // double front insert (d=2 only)
    for (d <- Seq(1, 2))
      assert(run(rows, d) == brute(rows, d), s"d=$d")
  }

  private def runLookup(probes: Seq[(Long, String)],
      corpus: Seq[(Long, String)], d: Int, q: Int = 2) = {
    def mk(rows: Seq[(Long, String)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      schema)
    FuzzyJoin.lookupPairs(mk(probes), mk(corpus), "id", "s", "id", "s",
        d, q)
      .select("id1", "id2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def bruteLookup(probes: Seq[(Long, String)],
      corpus: Seq[(Long, String)], d: Int) =
    (for {
      (pi, ps) <- probes; (ci, cs) <- corpus
      if lev(ps, cs) <= d
    } yield (pi, ci, lev(ps, cs).toLong)).toSet

  test("R-S lookup matches brute force: typos, unseen grams, shorts") {
    val corpus = (0L until 150L).map(i => i -> f"Item#${i}%05d") ++
      Seq(900L -> "ab", 901L -> "x", 902L -> "")
    val probes = Seq(
      1000L -> "Item#000x2",   // one substitution of Item#00012
      1001L -> "Item#0003",    // one deletion
      1002L -> "ZZZZZZ",       // grams the corpus never saw
      1003L -> "ax",           // short probe near corpus shorts
      1004L -> "",             // empty probe
      1005L -> "Item#00055")   // exact hit
    for (d <- Seq(1, 2))
      assert(runLookup(probes, corpus, d) ==
        bruteLookup(probes, corpus, d), s"d=$d")
  }

  test("seeded random sweep: self and lookup match brute force " +
      "across corpora shapes") {
    // five deterministic seeds × mixed string lengths (0..14) over a
    // 3-symbol alphabet — dense collision territory where every
    // routing boundary (short path, prefix shrink, position buckets,
    // and at d=2 the count filter's vacuous/active boundary) gets
    // exercised together
    for (seed <- 1 to 5; d <- Seq(1, 2)) {
      val rnd = new scala.util.Random(seed)
      def corpus(n: Int, base: Long) = (0 until n).map { i =>
        (base + i) -> Seq.fill(rnd.nextInt(15))(
          "abc" (rnd.nextInt(3))).mkString
      }
      val self = corpus(60, 0L)
      assert(run(self, d) == brute(self, d), s"self seed=$seed d=$d")
      val probes = corpus(15, 1000L)
      val cs = corpus(60, 0L)
      assert(runLookup(probes, cs, d) == bruteLookup(probes, cs, d),
        s"lookup seed=$seed d=$d")
    }
  }

  test("short strings (below q) route through the exact path") {
    val rows = Seq(1L -> "", 2L -> "a", 3L -> "b", 4L -> "ab",
      5L -> "abcdef")
    for (d <- Seq(1, 2))
      assert(run(rows, d) == brute(rows, d), s"d=$d")
  }
}
