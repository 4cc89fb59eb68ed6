package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property parity for the bigram-LM operators against naive
  * driver-side references on random corpora — the distributed
  * pair-agg/derived-count rewrites (DESIGN.md rule 8) must be
  * arithmetic-identical to the obvious serial computation, h32
  * hash-bucket merges included.
  */
class LanguageModelPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def h32(s: String): Long = java.lang.Long.parseLong(
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s).take(8), 16)

  private def ilog2(n: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(n)

  private def randomDocs(rnd: scala.util.Random): Map[Long, Seq[String]] = {
    val vocab = ('a' to ('a' + 2 + rnd.nextInt(4)).toChar).map(_.toString)
    (1L to (2 + rnd.nextInt(8)).toLong).map { id =>
      id -> Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
    }.toMap
  }

  test("bigramSurprisal == serial reference on 15 random corpora") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 15) {
      val docs = randomDocs(rnd)
      val bigrams = docs.toSeq.flatMap { case (id, toks) =>
        toks.zip(toks.drop(1)).map { case (a, b) => (id, s"$a $b", a) }
      }
      // reference counts keyed on the HASHES, exactly like the engine
      // and the oracle (collisions, if any, merge identically)
      val c2 = bigrams.groupBy(t => h32(t._2)).view.mapValues(_.size.toLong)
      val c1 = bigrams.groupBy(t => h32(t._3)).view.mapValues(_.size.toLong)
      val want = bigrams.groupBy(_._1).map { case (id, bs) =>
        val bits = bs.map(t => ilog2(c1(h32(t._3))) - ilog2(c2(h32(t._2))))
        id -> ((bs.size.toLong, bits.sum, bits.sum * 1000 / bs.size))
      }
      val df = docs.toSeq.map { case (id, toks) => (id, toks.mkString(" ")) }
        .filter(_._2.nonEmpty) // split("") would yield one "" token
        .toDF("doc_id", "text")
      val got = LanguageModel
        .bigramSurprisal(df, "doc_id", split(col("text"), " "))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val wantNonEmpty = want.filter(_._2._1 > 0)
      assert(got == wantNonEmpty, s"trial $trial docs=$docs")
    }
  }

  test("collocations == serial reference on 15 random corpora") {
    val rnd = new scala.util.Random(57)
    for (trial <- 1 to 15) {
      val docs = randomDocs(rnd)
      val bigrams = docs.toSeq.flatMap { case (_, toks) =>
        toks.zip(toks.drop(1)).map { case (a, b) => (s"$a $b", a, b) }
      }
      val n = bigrams.size.toLong
      val c2 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong)
      val c1a = bigrams.groupBy(_._2).view.mapValues(_.size.toLong)
      val c1b = bigrams.groupBy(_._3).view.mapValues(_.size.toLong)
      val minCount = 2
      val want = c2.filter(_._2 >= minCount).toSeq.map { case (bg, cnt) =>
        val w1 = bg.split(" ")(0); val w2 = bg.split(" ")(1)
        (bg, cnt, c1a(w1), c1b(w2),
          cnt * n * 1000 / (c1a(w1) * c1b(w2)))
      }.sortBy { case (bg, _, _, _, lift) => (-lift, bg) }.take(10)
      val df = docs.toSeq.map { case (id, toks) => (id, toks.mkString(" ")) }
        .filter(_._2.nonEmpty)
        .toDF("doc_id", "text")
      val got = LanguageModel.collocations(df, "doc_id",
        split(col("text"), " "), minCount = minCount, k = 10)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      assert(got.toSeq == want, s"trial $trial docs=$docs")
    }
  }
}
