package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LanguageModelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("ilog2 equals floor(log2) for n in 1..4096") {
    val got = (1L to 4096L).toDF("n")
      .select(col("n"), LanguageModel.ilog2(col("n")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (1L to 4096L).foreach { n =>
      assert(got(n) == (63 - java.lang.Long.numberOfLeadingZeros(n)), s"n=$n")
    }
  }

  test("bigramSurprisal: hand-computed corpus") {
    // C2: "a b"=3, "b a"=1, "b c"=1; C1: a=3, b=2
    // bits: ab -> ilog2(3)-ilog2(3)=0; ba -> ilog2(2)-ilog2(1)=1;
    //       bc -> ilog2(2)-ilog2(1)=1
    val docs = Seq(
      (1L, "a b a b"), // [ab, ba, ab] -> n=3 total=1 score=333
      (2L, "a b c"),   // [ab, bc]     -> n=2 total=1 score=500
      (3L, "solo")     // no bigrams   -> absent
    ).toDF("doc_id", "text")
    val out = LanguageModel
      .bigramSurprisal(docs, "doc_id", split(col("text"), " "))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 333L),
      (2L, 2L, 1L, 500L)))
  }

  test("repeated boilerplate scores lower than unique word salad") {
    // 20 copies of one sentence + 1 doc of unique tokens: the common
    // doc's bigrams are high-count (low surprisal), the salad's are
    // singletons against high-count first words where they share them.
    val common = (1L to 20L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val salad = Seq((99L, "zx qv wk jn pb md the lr ts"))
    val docs = (common ++ salad).toDF("doc_id", "text")
    val scores = LanguageModel
      .bigramSurprisal(docs, "doc_id", split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // common doc: only the two "the *" bigrams pay (C1(the)=41 -> 5 bits
    // vs C2=20 -> 4 bits): total 2 over 8 bigrams -> 250 milli-bits.
    // salad: singleton pairs are "perfectly predicted" (1 vs 1 -> 0),
    // but "the lr" pays ilog2(41) - ilog2(1) = 5: 5/8 -> 625.
    assert(scores(1L) == 250L)
    assert(scores(99L) == 625L)
    assert(scores(99L) > scores(1L))
  }

  test("collocations: bound phrase outranks frequent-word pairings") {
    // "new york" always together (6x); "of the" frequent but both words
    // are everywhere, diluting the lift.
    val docs = (1L to 6L).map(i => (i, "new york is one of the cities of the east")) ++
      Seq((7L, "the best of the rest of the lot"))
    val out = LanguageModel.collocations(docs.toDF("doc_id", "text"),
      "doc_id", split(col("text"), " "), minCount = 5, k = 5)
      .collect()
    val byBigram = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // "new york": c2=6, c1a(new·)=6, c1b(·york)=6, N = 6*9 + 7 = 61
    //   lift = (6*61*1000) div 36 = 10166
    assert(byBigram("new york") == ((6L, 6L, 6L, 10166L)))
    // "of the": c2 = 12+2? per common doc "of the" occurs 2x (x6) plus
    // doc 7 has "of the" 2x -> c2=14; c1a(of·)=14, c1b(·the)=14
    //   lift = (14*61*1000) div 196 = 4357
    assert(byBigram("of the") == ((14L, 14L, 14L, 4357L)))
    // ranking: the fully bound phrases tie on top (all 6/6/6), ordered
    // by bigram text; the diluted "of the" ranks below all of them
    assert(out.take(3).map(_.getString(0)).toSeq ==
      Seq("is one", "new york", "york is"))
    assert(out.take(3).forall(_.getLong(4) == 10166L))
  }
}
