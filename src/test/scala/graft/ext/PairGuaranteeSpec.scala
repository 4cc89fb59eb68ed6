package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pair-finder guarantees against naive QUADRATIC references on a
  * generated corpus — the scale-out implementations (inverted index +
  * df cutoff + self-join) must find exactly what the textbook all-pairs
  * definitions find. GramPropertySpec pins the per-document primitives;
  * this pins the PAIR level, where the join/window/dedup plumbing could
  * silently drop candidates.
  *
  * Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD '03) guarantee: any two
  * documents sharing a substring of >= w + k - 1 TOKENS share at least
  * one fingerprint. The proof shape: such a substring contains >= w
  * consecutive shared k-grams; the window over those w grams is a full
  * window in both documents; each keeps that window's minimum hash, and
  * the minimum VALUE of the same multiset of hashes is the same on both
  * sides (position only breaks ties among equal hashes, and equal
  * hashes are equal fingerprints) — so the kept fingerprint is shared.
  */
class PairGuaranteeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Longest common token-substring (contiguous) length, classic DP. */
  private def lcsLen(a: Array[String], b: Array[String]): Int = {
    val dp = Array.ofDim[Int](b.length + 1)
    var best = 0
    for (i <- 1 to a.length) {
      var prev = 0
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = if (a(i - 1) == b(j - 1)) prev + 1 else 0
        if (dp(j) > best) best = dp(j)
        prev = cur
      }
    }
    best
  }

  test("winnowPairs finds every pair sharing >= w+k-1 tokens (200-doc corpus)") {
    val (k, w) = (3, 4)
    val t = w + k - 1 // = 6, the guarantee threshold
    val rnd = new scala.util.Random(17)
    // planted phrases long enough to trigger the guarantee; drawn from a
    // token space disjoint from the filler so the ground truth stays
    // readable (the ORACLE below still computes real LCS, so accidental
    // filler overlaps are handled, not assumed away)
    val phrases = (0 until 12).map { i =>
      val len = t + rnd.nextInt(4)
      (0 until len).map(_ => s"s${i}_${rnd.nextInt(5)}")
    }
    val docs: Seq[(Long, Array[String])] = (0 until 200).map { i =>
      val filler = (0 until 10 + rnd.nextInt(30)).map(_ => s"f${rnd.nextInt(30)}")
      val withPhrase =
        if (rnd.nextDouble() < 0.4) {
          val ph = phrases(rnd.nextInt(phrases.size))
          val at = rnd.nextInt(filler.size + 1)
          filler.take(at) ++ ph ++ filler.drop(at)
        } else filler
      (i.toLong, withPhrase.toArray)
    }

    val found = NearDup.winnowPairs(
        docs.map { case (id, tk) => (id, tk.mkString(" ")) }.toDF("doc_id", "text"),
        "doc_id", TextAnalysis.tokens(col("text")), k, w)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

    // quadratic oracle: exact LCS over every pair
    val must = (for {
      (i, a) <- docs; (j, b) <- docs if i < j
      if lcsLen(a, b) >= t
    } yield (i, j)).toSet
    assert(must.nonEmpty, "corpus generated no qualifying pairs — weak test")
    val missed = must -- found
    assert(missed.isEmpty,
      s"winnowPairs missed ${missed.size} guaranteed pairs: ${missed.take(5)}")

    // soundness: every reported pair really shares a k-gram (a reported
    // pair shares a fingerprint = a kept gram hash; deterministic corpus,
    // so an h32 collision would be pinned here, not flaky)
    val gramSets = docs.map { case (id, tk) =>
      id -> tk.sliding(k).map(_.mkString(" ")).toSet
    }.toMap
    found.foreach { case (d1, d2) =>
      assert(gramSets(d1).intersect(gramSets(d2)).nonEmpty,
        s"pair ($d1,$d2) reported without any shared $k-gram")
    }
  }

  test("containmentPairs == naive all-pairs containment on a quoted corpus") {
    val k = 3
    val rnd = new scala.util.Random(23)
    // 40 base docs; 10 extra docs quote a base doc WHOLE inside fresh
    // filler — the syndication shape containment exists to catch
    val base = (0 until 40).map { i =>
      (i.toLong, (0 until 8 + rnd.nextInt(25)).map(_ => s"w${rnd.nextInt(40)}"))
    }
    val quoting = (0 until 10).map { i =>
      val src = base(rnd.nextInt(base.size))._2
      val filler = (0 until 12 + rnd.nextInt(20)).map(_ => s"w${rnd.nextInt(40)}")
      val at = rnd.nextInt(filler.size + 1)
      (100L + i, filler.take(at) ++ src ++ filler.drop(at))
    }
    val docs = base ++ quoting
    val shingled = docs.map { case (id, tk) =>
      (id, "en", tk.sliding(k).map(_.mkString(" ")).toSeq)
    }

    val got = NearDup.containmentPairs(
        shingled.toDF("doc_id", "lang", "sh"), minContainMilli = 800L)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

    // naive quadratic reference over DISTINCT gram sets, both directions
    val sets = docs.map { case (id, tk) =>
      id -> tk.sliding(k).map(_.mkString(" ")).toSet
    }.toMap
    val want = (for {
      (i, _) <- docs; (j, _) <- docs if i != j
      si = sets(i); sj = sets(j)
      if si.nonEmpty && (si.intersect(sj).size.toLong * 1000) / si.size >= 800L
    } yield (i, j)).toSet
    assert(want.nonEmpty, "corpus generated no containment pairs — weak test")
    assert(got == want,
      s"missed=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }
}
