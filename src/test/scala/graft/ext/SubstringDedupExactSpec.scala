package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** SubstringDedup vs the EXACT Lee et al. (arXiv:2107.06499) removal
  * set, computed by a driver-side pairwise-LCP reference (the suffix
  * array's defining relation, brute-forced — no Spark, no hashing):
  * token position p is removed iff it lies inside SOME substring of
  * >= k tokens that occurs >= 2 times corpus-wide.
  *
  * The measured result is EQUALITY, not an approximation gap, when the
  * gram size equals the paper's threshold (n = k): if a substring S
  * with |S| >= k occurs at positions q1 != q2, every length-k window of
  * S occurs at both q1+o and q2+o, so each of S's positions is covered
  * by a duplicated k-gram; conversely a duplicated k-gram IS a length-k
  * substring occurring twice. The gram lattice therefore quantizes
  * NOTHING at n = k — over-removal 0, under-removal 0, spans identical
  * to the exact maximal runs. The operator's header documents this.
  *
  * The real quantization hazard is parameterization: approximating
  * threshold k with a SMALLER gram (n < k) over-removes (every dup
  * n-gram marks, including ones inside no >= k dup substring) while
  * never under-removing — measured below so the rate is a number, not
  * a guess.
  */
class SubstringDedupExactSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val K = 50 // the paper's token threshold

  /** Seeded corpus with planted structure around the threshold:
    * cross-doc dup of 60 (removed), cross-doc dup of 49 (kept: below
    * threshold), within-doc dup of exactly 50 (removed), a 120-token
    * single-symbol run (overlapping self-repeats, removed), plus
    * random filler.
    */
  private val corpus: Seq[(Long, IndexedSeq[String])] = {
    val rnd = new scala.util.Random(7)
    def filler(n: Int) = IndexedSeq.fill(n)(s"t${rnd.nextInt(50)}")
    val chunkA = IndexedSeq.tabulate(60)(i => s"a$i")
    val chunkB = IndexedSeq.tabulate(49)(i => s"b$i")
    val chunkC = IndexedSeq.tabulate(50)(i => s"c$i")
    Seq(
      0L -> (filler(80) ++ chunkA ++ filler(60)),
      1L -> (filler(40) ++ chunkB ++ filler(90)),
      2L -> (filler(120) ++ chunkA ++ filler(30)),
      3L -> (filler(20) ++ chunkC ++ filler(35) ++ chunkC ++ filler(40)),
      4L -> (filler(70) ++ chunkB ++ filler(25)),
      5L -> (filler(30) ++ IndexedSeq.fill(120)("rr") ++ filler(50)),
      6L -> filler(200),
      7L -> (filler(10) ++ chunkA.take(30) ++ filler(110)) // 30 < K: kept
    )
  }

  /** EXACT removal set per the paper: pairwise longest-common-extension
    * over all suffix pairs; an LCE >= k marks both windows. O(N^2 * LCE)
    * — the honest spec-side reference, not a scalable algorithm.
    */
  private def exactCovered(k: Int): Map[Long, Set[Int]] = {
    val suffixes = for {
      (d, toks) <- corpus
      i <- toks.indices
    } yield (d, i)
    val byDoc = corpus.toMap
    val covered = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Int]]
    def mark(d: Long, from: Int, to: Int): Unit = {
      val s = covered.getOrElseUpdate(d, scala.collection.mutable.Set.empty)
      (from to to).foreach(s += _)
    }
    for (a <- suffixes.indices; b <- (a + 1) until suffixes.size) {
      val (d1, i1) = suffixes(a)
      val (d2, i2) = suffixes(b)
      val (t1, t2) = (byDoc(d1), byDoc(d2))
      var l = 0
      while (i1 + l < t1.size && i2 + l < t2.size &&
        t1(i1 + l) == t2(i2 + l)) l += 1
      if (l >= k) {
        mark(d1, i1, i1 + l - 1)
        mark(d2, i2, i2 + l - 1)
      }
    }
    covered.view.mapValues(_.toSet).toMap.withDefaultValue(Set.empty)
  }

  private def docsDf = corpus
    .map { case (d, toks) => (d, toks.mkString(" ")) }
    .toDF("doc_id", "text")

  /** Operator-side covered set at gram size n. */
  private def operatorCovered(n: Int): Map[Long, Set[Int]] =
    SubstringDedup.duplicatedStarts(docsDf, "doc_id",
        split(col("text"), " "), n, minCount = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt))
      .groupBy(_._1)
      .view.mapValues(_.flatMap { case (_, p) => p until (p + n) }.toSet)
      .toMap.withDefaultValue(Set.empty)

  test("gram lattice at n = threshold EQUALS the exact suffix-pair " +
      "removal set: over-removal 0, under-removal 0") {
    val exact = exactCovered(K)
    val got = operatorCovered(K)
    // sanity on the planted structure before comparing implementations
    assert(exact(0L).nonEmpty && exact(2L).nonEmpty, "chunkA removed")
    assert(exact(1L).isEmpty && exact(4L).isEmpty, "chunkB (49 < K) kept")
    assert(exact(3L).size >= 100, "within-doc chunkC removed at both sites")
    assert(exact(5L).size >= 120, "the rr run removed")
    assert(exact(6L).isEmpty && exact(7L).isEmpty, "filler + short prefix kept")
    val docs = corpus.map(_._1)
    val over = docs.map(d => (got(d) -- exact(d)).size).sum
    val under = docs.map(d => (exact(d) -- got(d)).size).sum
    val total = docs.map(d => exact(d).size).sum
    info(s"n=$K: exact-covered tokens=$total over=$over under=$under")
    assert(over == 0, s"operator removed $over tokens the paper keeps")
    assert(under == 0, s"operator kept $under tokens the paper removes")
  }

  test("removeDuplicatedSpans' cut counts and fingerprints match the " +
      "exact reference") {
    val exact = exactCovered(K)
    val got = SubstringDedup.removeDuplicatedSpans(docsDf, "doc_id",
        split(col("text"), " "), n = K, minCount = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    for ((d, toks) <- corpus) {
      val (nTokens, nRemoved, fp) = got(d)
      assert(nTokens == toks.size)
      assert(nRemoved == exact(d).size, s"doc $d removal count")
      val cleaned = toks.indices.filterNot(exact(d)).map(toks).mkString(" ")
      assert(fp == org.apache.commons.codec.digest.DigestUtils
        .md5Hex(cleaned), s"doc $d cleaned fingerprint")
    }
  }

  test("under-quantized gram (n < threshold) never under-removes; its " +
      "over-removal rate is measured") {
    val exact = exactCovered(K)
    for (n <- Seq(10, 25)) {
      val got = operatorCovered(n)
      val docs = corpus.map(_._1)
      val over = docs.map(d => (got(d) -- exact(d)).size).sum
      val under = docs.map(d => (exact(d) -- got(d)).size).sum
      val corpusTokens = corpus.map(_._2.size).sum
      info(f"n=$n vs k=$K: over=$over (${over * 100.0 / corpusTokens}%.1f%% " +
        f"of corpus) under=$under")
      assert(under == 0, s"n=$n must cover everything the paper removes")
      assert(over > 0, s"n=$n should over-remove on the planted corpus " +
        "(if not, the measurement corpus is too easy)")
    }
  }
}
