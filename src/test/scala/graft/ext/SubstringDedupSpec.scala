package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Hand-computed corpus for the ExactSubstr-style gram-lattice dedup:
  * docs 1 and 2 share an 8-token run ("a b c d e f g h"), doc 3 repeats
  * a 5-token phrase WITHIN itself, doc 4 is clean, doc 5 is a verbatim
  * copy of doc 1 (every position covered). n = 5, minCount = 2.
  */
class SubstringDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h x1 y1 z1"),          // shared run at pos 0..7
    (2L, "p2 q2 a b c d e f g h r2"),          // same run at pos 2..9
    (3L, "k k k k k m3 n3 o3 k k k k k u3 v3"), // internal repeat
    (4L, "clean4 doc4 has4 no4 duplicated4 grams4 at4 all4"),
    (5L, "a b c d e f g h x1 y1 z1")           // full copy of doc 1
  ).toDF("doc_id", "text")

  private def tokens = split(col("text"), " ")

  test("duplicatedSpans finds the shared run, the internal repeat, and the full copy") {
    val spans = SubstringDedup
      .duplicatedSpans(docs, "doc_id", tokens, n = 5, minCount = 2)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // doc 1: positions 0..7 shared with doc 2 — but doc 5 duplicates the
    // WHOLE doc, so every 5-gram of doc 1 occurs twice: span 0..10.
    // doc 2: grams starting at 2..5 (the 8-token run) → span 2..9.
    // doc 3: "k k k k k" occurs at starts 0 and 8..8? tokens:
    //   0..4 = k k k k k, 8..12 = k k k k k → starts {0, 8}; gap
    //   8 > 0 + 5 → two separate spans 0..4 and 8..12.
    // doc 4: nothing. doc 5: full copy → span 0..10.
    assert(spans.toSeq == Seq(
      (1L, 0L, 10L, 7L),
      (2L, 2L, 9L, 4L),
      (3L, 0L, 4L, 1L), (3L, 8L, 12L, 1L),
      (5L, 0L, 10L, 7L)))
  }

  test("adjacent coverage merges into one span (p2 == p1 + n)") {
    // one doc where gram starts are exactly n apart: "w w w w w v w w w w w"
    // has "w w w w w" at starts 0 and 6 in doc A... use two docs sharing
    // two disjoint phrases separated by a unique middle token so starts
    // are 0 and 6: coverage [0,4] and [6,10] does NOT touch (6 > 0+5);
    // starts 0 and 5 DOES merge (5 <= 0+5).
    val d = Seq(
      (10L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"), // starts 0..5 all dup (copy)
      (11L, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup
      .duplicatedSpans(d, "doc_id", split(col("text"), " "), 5, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSet == Set((10L, 0L, 9L), (11L, 0L, 9L)))
  }

  test("removeDuplicatedSpans cuts exactly the covered tokens and fingerprints the rest") {
    val out = SubstringDedup
      .removeDuplicatedSpans(docs, "doc_id", tokens, n = 5, minCount = 2)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    def md5hex(s: String): String =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

    assert(out.map(t => (t._1, t._2, t._3)).toSeq == Seq(
      (1L, 11L, 11L), // whole doc removed
      (2L, 11L, 8L),  // pos 2..9 removed → p2 q2 r2 survive
      (3L, 15L, 10L), // pos 0..4 and 8..12 removed → m3 n3 o3 u3 v3
      (4L, 8L, 0L),   // untouched
      (5L, 11L, 11L)))
    assert(out(0)._4 == md5hex(""))
    assert(out(1)._4 == md5hex("p2 q2 r2"))
    assert(out(2)._4 == md5hex("m3 n3 o3 u3 v3"))
    assert(out(3)._4 == md5hex("clean4 doc4 has4 no4 duplicated4 grams4 at4 all4"))
  }

  test("null ids are excluded; docs shorter than n produce no spans") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("text", StringType, nullable = true)))
    val d = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(20L, "s1 s2 s3"), // < n tokens
        Row(null, "a b c d e f g h x1 y1 z1")),
      schema)
    val spans = SubstringDedup
      .duplicatedSpans(d, "doc_id", split(col("text"), " "), 5, 2)
    assert(spans.count() == 0L)
    val cleaned = SubstringDedup
      .removeDuplicatedSpans(d, "doc_id", split(col("text"), " "), 5, 2)
      .collect()
    assert(cleaned.map(_.getLong(0)).toSeq == Seq(20L))
    assert(cleaned.head.getLong(2) == 0L) // nothing removed
  }
}
