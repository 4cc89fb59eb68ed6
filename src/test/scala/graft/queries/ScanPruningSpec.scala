package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestBase}

/** Scan-level pushdown guards: predicates and projections must reach
  * the parquet reader. At 100 TB the difference between scanning two
  * columns and scanning all of them — or between a pushed `doc_id < 25`
  * and a post-scan filter — is the job's I/O bill; a refactor that
  * breaks pushdown (e.g. wrapping the filter column in an expression)
  * should fail here, not in production.
  */
class ScanPruningSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString

  test("q_dsir pushes the target-subset predicate into the scan") {
    assert(plan("q_dsir").contains("LessThan(doc_id,25)"),
      "doc_id < 25 should appear in PushedFilters, not post-scan")
  }

  test("q_count reads ZERO columns (count-only scan)") {
    assert(plan("q_count").contains("ReadSchema: struct<>"),
      "count(*) must not materialize any column")
  }

  test("q_split prunes text out of the documents scan") {
    val p = plan("q_split")
    assert(p.contains("ReadSchema:"), "expected a parquet scan")
    assert(!p.contains("text:string"),
      "q_split touches only doc_id/lang — scanning text is wasted I/O")
  }

  test("q_dedup_minhash pushes its null guard to the scan") {
    assert(plan("q_dedup_minhash").contains("PushedFilters: [IsNotNull(text)"),
      "the text IS NOT NULL guard should reach the parquet reader")
  }

  test("q_pagerank prunes the WAT tail scan to its two url columns") {
    val p = plan("q_pagerank")
    assert(p.contains("ReadSchema:"), "expected a parquet scan")
    // the tail parquet carries uid/url/alt/cc_filename/page_url; the
    // edge list touches only page_url + url — alt and uid in the
    // ReadSchema would be 3/5 of the scan wasted
    assert(!p.contains("alt:string") && !p.contains("uid:string"),
      "host-graph queries must scan only page_url/url:\n" + p.take(2000))
  }

  test("q_domain_graph keeps page_url but prunes uid/alt") {
    val p = plan("q_domain_graph")
    assert(!p.contains("alt:string") && !p.contains("uid:string"),
      "q_domain_graph reads page_url/url only:\n" + p.take(2000))
  }
}
