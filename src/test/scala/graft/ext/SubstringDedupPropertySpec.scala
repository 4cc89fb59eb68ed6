package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property parity for the gram-lattice substring dedup against a
  * naive driver-side reference on random corpora with planted overlaps
  * — spans, merge boundaries, and the removal transform must all match
  * EXACTLY (the DuckDB oracle mirrors the same arithmetic).
  */
class SubstringDedupPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val n = 4 // gram size under test (not the production 5 — the
                    // math must hold for any n)

  /** Naive reference: all n-gram occurrences, corpus counts, covered
    * positions, maximal spans by linear scan.
    */
  private def refSpans(docs: Map[Long, Seq[String]])
      : (Map[Long, Seq[(Long, Long, Long)]], Map[Long, (Long, String)]) = {
    val occ = docs.toSeq.flatMap { case (id, toks) =>
      toks.sliding(n).zipWithIndex.collect {
        case (g, p) if g.size == n => (id, p.toLong, g.mkString(" "))
      }
    }
    val counts = occ.groupBy(_._3).view.mapValues(_.size).toMap
    val dupStarts = occ.filter(o => counts(o._3) >= 2)
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val spans = dupStarts.map { case (id, starts) =>
      val islands = starts.foldLeft(List.empty[List[Long]]) {
        case (Nil, p) => List(List(p))
        case (cur :: done, p) =>
          if (p <= cur.head + n) (p :: cur) :: done else List(p) :: cur :: done
      }.map(_.reverse).reverse
      id -> islands.map(is =>
        (is.head, is.last + n - 1, is.size.toLong))
    }
    val cleaned = docs.map { case (id, toks) =>
      val covered = dupStarts.getOrElse(id, Nil)
        .flatMap(p => p until p + n).toSet
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !covered(i.toLong) => t
      }
      id -> ((toks.size - kept.size).toLong,
        org.apache.commons.codec.digest.DigestUtils.md5Hex(kept.mkString(" ")))
    }
    (spans, cleaned)
  }

  test("distributed == reference on 20 random small-vocab corpora") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 20) {
      val vocab = ('a' to ('a' + 2 + rnd.nextInt(3)).toChar).map(_.toString)
      val docs = (1L to (3 + rnd.nextInt(6)).toLong).map { id =>
        id -> Seq.fill(2 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size)))
      }.toMap
      val df = docs.toSeq.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val (wantSpans, wantClean) = refSpans(docs)

      val gotSpans = SubstringDedup
        .duplicatedSpans(df, "doc_id", split(col("text"), " "), n, 2)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
        .groupBy(_._1).view
        .mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
      assert(gotSpans == wantSpans.view.filter(_._2.nonEmpty)
        .mapValues(_.sortBy(_._1)).toMap, s"trial $trial docs=$docs")

      val gotClean = SubstringDedup
        .removeDuplicatedSpans(df, "doc_id", split(col("text"), " "), n, 2)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
      assert(gotClean == wantClean, s"trial $trial docs=$docs")
    }
  }
}
