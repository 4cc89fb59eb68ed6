package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed PageRank fixpoints and edge-construction semantics for
  * graft.ext.LinkGraph.
  */
class LinkGraphSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("triangle cycle is a fixpoint at uniform rank") {
    // A→B→C→A, all outdeg 1: c = 10^6, r' = 150000 + 850*10^6/1000 = 10^6
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val r = LinkGraph.pagerankMicro(edges, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(r == Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
  }

  test("star graph concentrates rank on the hub, exact integers") {
    // a→h, b→h, c→h; h has no out-edges (dangling, mass dropped).
    // iter1: leaves r = 150000 (no in-edges); h = 150000 + 850*3*10^6/1000
    //        = 2700000... contribution per leaf = 10^6 div 1 = 10^6,
    //        sum = 3*10^6, r(h) = 150000 + (850*3000000) div 1000
    //        = 150000 + 2550000 = 2700000
    // iter2: h = 150000 + (850 * 3*150000) div 1000 = 150000 + 382500
    //        = 532500; leaves stay 150000
    // iter3: h = 532500 again (leaves unchanged)
    val edges = Seq(("a", "h"), ("b", "h"), ("c", "h")).toDF("src", "dst")
    val r = LinkGraph.pagerankMicro(edges, iters = 3)
      .as[(String, Long)].collect().toMap
    assert(r("h") == 532500L)
    assert(r("a") == 150000L && r("b") == 150000L && r("c") == 150000L)
  }

  test("outdeg splits contribution with floor division") {
    // a→b, a→c (outdeg 2): c(a) = 10^6 div 2 = 500000
    // iter1: r(b) = r(c) = 150000 + (850*500000) div 1000 = 575000
    val edges = Seq(("a", "b"), ("a", "c")).toDF("src", "dst")
    val r = LinkGraph.pagerankMicro(edges, iters = 1)
      .as[(String, Long)].collect().toMap
    assert(r("b") == 575000L && r("c") == 575000L)
    assert(r("a") == 150000L)
  }

  test("hostEdges drops self-loops, empties, and duplicate links") {
    val rows = Seq(
      ("https://x.test/p1", "https://cdn.test/a.png"),
      ("https://x.test/p2", "https://cdn.test/b.png"), // same edge
      ("https://x.test/p1", "https://x.test/self.png"), // self-loop
      ("not a url", "https://cdn.test/c.png") // empty src host
    ).toDF("page_url", "url")
    val e = LinkGraph.hostEdges(rows, col("page_url"), col("url"))
      .as[(String, String)].collect().toSet
    assert(e == Set(("x.test", "cdn.test")))
  }
}
