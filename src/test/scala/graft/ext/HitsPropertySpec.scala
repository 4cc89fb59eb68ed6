package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property parity for the distributed integer HITS against a naive
  * driver-side reference on random graphs — unnormalized integer
  * mutual reinforcement must match EXACTLY (the DuckDB oracle mirrors
  * the same arithmetic), including isolated-direction nodes scoring 0.
  */
class HitsPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def refHits(edges: Set[(String, String)],
      iters: Int): Map[String, (Long, Long)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    var hub = nodes.map(_ -> 1L).toMap
    var auth = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      auth = nodes.map { n =>
        n -> edges.toSeq.collect { case (s, d) if d == n => hub(s) }.sum
      }.toMap
      hub = nodes.map { n =>
        n -> edges.toSeq.collect { case (s, d) if s == n => auth(d) }.sum
      }.toMap
    }
    nodes.map(n => n -> (auth(n), hub(n))).toMap
  }

  test("distributed == reference on 30 random graphs, iters 1..3") {
    val rnd = new scala.util.Random(7)
    for (iters <- 1 to 3) {
      val cases = Seq.fill(10) {
        val n = 2 + rnd.nextInt(8)
        val m = 1 + rnd.nextInt(2 * n)
        Seq.fill(m)((s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
          .filter { case (a, b) => a != b }.toSet
      }.filter(_.nonEmpty)
      cases.zipWithIndex.foreach { case (edges, i) =>
        val df = edges.toSeq.toDF("src", "dst")
        val got = LinkGraph.hitsScores(df, iters)
          .as[(String, Long, Long)].collect()
          .map(t => t._1 -> (t._2, t._3)).toMap
        val want = refHits(edges, iters)
        assert(got == want,
          s"case $i iters=$iters edges=$edges:\n got $got\nwant $want")
      }
    }
  }

  test("hand graph: one hub pointing at two authorities") {
    // h -> a1, h -> a2, x -> a1. After round 1: auth(a1)=2? no —
    // hub0 = 1 everywhere: auth1(a1) = hub0(h)+hub0(x) = 2,
    // auth1(a2) = 1; hub1(h) = auth1(a1)+auth1(a2) = 3, hub1(x) = 2.
    val edges = Seq(("h", "a1"), ("h", "a2"), ("x", "a1"))
    val got = LinkGraph.hitsScores(edges.toDF("src", "dst"), iters = 1)
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == Map(
      "h" -> (0L, 3L), "x" -> (0L, 2L),
      "a1" -> (2L, 0L), "a2" -> (1L, 0L)))
  }
}
