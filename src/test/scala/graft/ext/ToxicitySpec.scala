package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ToxicitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val terms = Seq("casino", "xxx", "spam")

  test("gate counts whole-word case-insensitive hits and verdicts") {
    val docs = Seq(
      (1L, "a", "clean text here"),
      (2L, "a", "visit the CASINO casino tonight"), // 2 hits, 1 term
      (3L, "b", "xxx spam casino"),                 // 3 hits, 3 terms
      (4L, "b", "casinos are not flagged"),         // substring: no hit
      (5L, "b", null: String)                       // null propagates
    ).toDF("doc_id", "source", "text")
    val got = Toxicity.gate(docs, "text", terms)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) null else r.getBoolean(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, false),
      (2L, 2L, 1L, true),
      (3L, 3L, 3L, true),
      (4L, 0L, 0L, false),
      (5L, -1L, -1L, null)))
  }

  test("sourceRollup aggregates with null verdicts as not-flagged") {
    val docs = Seq(
      (1L, "a", "clean"), (2L, "a", "casino casino"),
      (3L, "b", null: String), (4L, "b", "spam")
    ).toDF("doc_id", "source", "text")
    val got = Toxicity.sourceRollup(
        Toxicity.gate(docs, "text", terms), "source")
      .orderBy("source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      ("a", 2L, 1L, 2L, 500L),
      ("b", 2L, 1L, 1L, 500L)))
  }

  test("relational (big-lexicon) gate matches the regex gate on clean text") {
    val docs = Seq(
      (1L, "a", "clean text here"),
      (2L, "a", "visit the CASINO casino tonight"),
      (3L, "b", "xxx spam casino"),
      (4L, "b", "casinos are not flagged"),
      (5L, "b", null: String)
    ).toDF("doc_id", "source", "text")
    val re = Toxicity.gate(docs, "text", terms)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val rel = Toxicity.gateRelational(docs, "doc_id", "text", terms)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(rel == re, "token-join form must agree on whitespace-clean text")
  }

  test("the relational gate broadcasts the term table (no corpus shuffle on content)") {
    val docs = Seq((1L, "a", "t")).toDF("doc_id", "source", "text")
    val plan = Toxicity.gateRelational(docs, "doc_id", "text", terms)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin"),
      s"the term table must broadcast:\n${plan.take(1500)}")
  }

  test("compile rejects metacharacters and empty lexicons loudly") {
    intercept[IllegalArgumentException](Toxicity.compile(Seq("a.b")))
    intercept[IllegalArgumentException](Toxicity.compile(Seq("CASINO")))
    intercept[IllegalArgumentException](Toxicity.compile(Nil))
    assert(Toxicity.compile(Seq("b", "a", "b")) == "\\b(a|b)\\b",
      "pattern must be deduped + sorted (deterministic for any file order)")
  }

  test("the committed lexicon loads, validates, and compiles") {
    val ts = Toxicity.DefaultTerms
    assert(ts.nonEmpty && ts == ts.sorted && ts.distinct == ts)
    assert(ts.contains("casino"), "the fixture boilerplate term must exist")
    Toxicity.compile(ts) // must not throw
  }

  test("the gate plans zero shuffles (pure per-row scan ride-along)") {
    val docs = Seq((1L, "a", "t")).toDF("doc_id", "source", "text")
    val plan = Toxicity.gate(docs, "text", terms)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"the per-row gate must not shuffle:\n${plan.take(1500)}")
  }
}
