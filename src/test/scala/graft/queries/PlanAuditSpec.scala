package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Plan-shape regression guard over the ENTIRE query battery: no query
  * may plan a CartesianProduct, and BroadcastNestedLoopJoin may appear
  * only where it is the intended physical form of a broadcast crossJoin
  * (similarity search scans the corpus once per broadcast query batch —
  * that IS the design). Anything else showing up here is a scale
  * regression: an equi-join that lost its keys, or a range predicate
  * that stopped being bucketed.
  */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  // broadcast-crossJoin by design: brute-force top-k and IVF centroid
  // assignment (broadcast queries / centroids against the corpus);
  // q_kmeans runs ivfAssign per Lloyd round, q_semdedup once,
  // q_ann_recall composes both sides (IVF index + brute-force truth);
  // q_tfidf/q_bm25/q_collocations broadcast a 1-ROW corpus-totals
  // aggregate (N, avgdl) to every scored row — the canonical
  // scalar-broadcast shape (q_heavy_hitters USED to be here; its
  // total now rides the exploded candidate broadcast, hash-joined)
  private val bnljAllowed = Set(
    "q_cosine_topk", "q_ann_ivf", "q_ann_ivf_mp", "q_kmeans", "q_semdedup",
    "q_semdedup_audit", "q_ann_recall", "q_tfidf", "q_bm25",
    "q_collocations", "q_ann_ivfpq", "q_ppl_buckets",
    // the clustered-fixture siblings compose the same broadcast
    // crossJoin operators (ivfAssign / semDedup / bruteForceTopK)
    // over the 512-vector planted-geometry fixture
    "q_semdedup_clustered", "q_ann_recall_clustered",
    // trained-PQ scorecard composes bruteForceTopK ground truth;
    // ivfpq_trained composes ivfAssign's 1-row broadcast argmax
    "q_ann_pq_recall", "q_ann_ivfpq_trained")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      if !name.startsWith("q_wat")) {
    test(s"$name plans without cartesian products or stray nested loops") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!bnljAllowed(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the allowed set")
      }
    }
  }

  // positive shape assertions: the broadcasts that are load-bearing for
  // the 100 TB story must actually plan as broadcasts (q_robots_gate:
  // the frontier side must NEVER shuffle for the rules join under the
  // domain-count threshold — the r16 driver-collect fix's plan witness)
  for (name <- Seq("q_broadcast_join", "q_decontam", "q_robots_gate")) {
    test(s"$name plans its small side as a broadcast") {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastExchange") ||
        plan.contains("BroadcastHashJoin"),
        s"$name lost its broadcast — the fact side would shuffle at scale")
    }
  }

  test("q_intersect and q_except plan as semi/anti hash joins, not unions") {
    val inter = SparkEntry.queries("q_intersect")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val except = SparkEntry.queries("q_except")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(inter.contains("LeftSemi"), "INTERSECT should plan a semi join")
    assert(except.contains("LeftAnti"), "EXCEPT should plan an anti join")
  }
}
