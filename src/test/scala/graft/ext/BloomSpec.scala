package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BloomSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus = (1L to 200L).map(i => (s"k${i % 50}", i))
    .toDF("fp", "id")
  private val blockset = Seq("k3", "k17", "k42", "absent")
    .toDF("fp")

  private def expected = corpus
    .join(blockset, Seq("fp"), "left_anti")
    .select("id").as[Long].collect().toSet

  test("bloomAntiJoin equals the plain exact anti-join") {
    val got = Contamination.bloomAntiJoin(corpus, blockset, "fp")
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.size == 200 - 3 * 4) // keys k3/k17/k42 each cover 4 ids
  }

  test("exactness is independent of bloom sizing (tiny filter, high FP rate)") {
    // estimatedItems=1 under-sizes the bloom so badly that most probes
    // come back maybe=true — every one of them must be settled by the
    // exact anti-join, leaving the result unchanged
    val got = Contamination.bloomAntiJoin(corpus, blockset, "fp",
      estimatedItems = 1L)
      .select("id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("empty blockset keeps the whole corpus") {
    val got = Contamination.bloomAntiJoin(corpus,
      blockset.where(lit(false)), "fp")
      .count()
    assert(got == 200L)
  }

  test("null keys survive like anti-join semantics say they must") {
    val withNull = corpus.union(Seq((null: String, 999L)).toDF("fp", "id"))
    val got = Contamination.bloomAntiJoin(withNull, blockset, "fp")
      .select("id").as[Long].collect().toSet
    assert(got.contains(999L))
    assert(got == expected + 999L)
  }
}
