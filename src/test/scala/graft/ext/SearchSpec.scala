package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SearchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("phraseMatches counts exact aligned occurrences only") {
    val docs = Seq(
      (1L, "a b c x a b c"),   // "a b c" twice
      (2L, "a b x c"),         // words present, never aligned
      (3L, "c b a"),           // reversed
      (4L, "a b c"),           // once, whole doc
      (5L, "a a b c")          // once, offset start
    ).toDF("doc_id", "text")
    val got = Search.phraseMatches(docs, "doc_id",
      split(col("text"), " "), Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("single-word phrase degenerates to token occurrence counts") {
    val docs = Seq((1L, "w q w"), (2L, "q")).toDF("doc_id", "text")
    val got = Search.phraseMatches(docs, "doc_id",
      split(col("text"), " "), Seq("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L))
  }

  test("overlapping self-repetition counts every start position") {
    // "k k k k": phrase "k k" starts at 0,1,2
    val docs = Seq((1L, "k k k k")).toDF("doc_id", "text")
    val got = Search.phraseMatches(docs, "doc_id",
      split(col("text"), " "), Seq("k", "k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L))
  }
}
