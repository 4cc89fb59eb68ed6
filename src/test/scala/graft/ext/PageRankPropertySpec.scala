package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Property parity for the distributed integer PageRank against a naive
  * driver-side reference on random graphs — the recurrence (including
  * its floor divisions and dangling-mass drop) must match EXACTLY,
  * since the DuckDB oracle mirrors the same integer arithmetic.
  */
class PageRankPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Naive reference: same micro-integer recurrence, plain Scala maps. */
  private def refPagerank(edges: Set[(String, String)],
      iters: Int): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val sums = edges.toSeq
        .map { case (s, d) => d -> r(s) / outdeg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map(n => n -> (150000L + 850L * sums.getOrElse(n, 0L) / 1000L))
        .toMap
    }
    r
  }

  test("distributed == reference on 30 random graphs, iters 1..3") {
    val rnd = new scala.util.Random(42)
    // accumulate all cases into ONE spark job per iteration count
    for (iters <- 1 to 3) {
      val cases = Seq.fill(10) {
        val n = 2 + rnd.nextInt(8) // 2..9 nodes
        val m = 1 + rnd.nextInt(2 * n) // 1..2n candidate edges
        Seq.fill(m)((s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
          .filter { case (a, b) => a != b }.toSet
      }.filter(_.nonEmpty)
      cases.zipWithIndex.foreach { case (edges, i) =>
        val df = edges.toSeq.toDF("src", "dst")
        val got = LinkGraph.pagerankMicro(df, iters)
          .as[(String, Long)].collect().toMap
        val want = refPagerank(edges, iters)
        assert(got == want,
          s"case $i iters=$iters edges=$edges:\n got $got\nwant $want")
      }
    }
  }
}
