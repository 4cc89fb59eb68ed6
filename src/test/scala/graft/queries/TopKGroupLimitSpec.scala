package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Freezes the map-side rank pruning on every top-k-per-group query:
  * their `row_number <= k` filter must plan a WindowGroupLimit (Spark's
  * partial/final group-limit pushdown), which keeps only k rows per key
  * in EACH map task before the window shuffle. Without it, a hot group
  * (one query vector against the whole corpus, one over-represented
  * language) ships its entire membership to a single window partition —
  * the same hot-key hazard the dedup operators de-skewed, solved here
  * by the optimizer as long as the rank filter stays adjacent to the
  * window. A refactor that breaks adjacency (e.g. projecting between
  * the window and the filter) fails this spec, not a 100 TB run.
  */
class TopKGroupLimitSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private val topkQueries = Seq(
    "q_cosine_topk", // corpus-sized group per query vector
    "q_ann_ivf", // probed-cell candidates per query
    "q_ann_ivf_mp", // multi-probe variant
    "q_ann_pq", // ADC candidates per query
    "q_window_topk", // revenue top-3 per region
    "q_lang_quota", // per-language quota over the whole corpus
    "q_domain_cap", // per-registered-domain cap (hot-domain hazard)
    "q_tfidf" // top-5 terms per doc (bounded partitions, but keep pruned)
  )

  for (name <- topkQueries) {
    test(s"$name prunes to top-k map-side via WindowGroupLimit") {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"$name lost its rank-filter pushdown:\n${plan.take(3000)}")
    }
  }
}
