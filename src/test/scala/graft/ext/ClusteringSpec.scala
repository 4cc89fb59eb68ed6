package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ClusteringSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], maxIters: Int = 25) =
    Clustering.connectedComponents(pairs.toDF("d1", "d2"),
      maxIters = maxIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive chain collapses to one cluster under min label") {
    // 1-2, 2-3, 3-4: pairwise dedup sees three pairs; the component is one
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate minimum labels") {
    val got = cc(Seq((5L, 9L), (2L, 7L), (7L, 3L)))
    assert(got == Map(5L -> 5L, 9L -> 5L, 2L -> 2L, 7L -> 2L, 3L -> 2L))
  }

  test("long path converges within diameter rounds and duplicate/reversed edges are harmless") {
    val chain = (1L until 12L).map(i => (i + 1, i)) // reversed order edges
    val dups = chain ++ chain.map { case (a, b) => (b, a) }
    val got = cc(dups, maxIters = 15)
    assert(got.keySet == (1L to 12L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("non-convergence fails loudly instead of returning wrong labels") {
    val chain = (1L to 9L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      Clustering.connectedComponents(chain.toDF("d1", "d2"), maxIters = 2)
        .collect()
    }
  }

  private def ccStar(pairs: Seq[(Long, Long)], maxIters: Int = 25) =
    Clustering.connectedComponents(pairs.toDF("d1", "d2"),
      maxIters = maxIters, strategy = Clustering.CcStrategy.AlternatingStar)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("alternating-star converges on a 10k-node path where min-label would exhaust maxIters") {
    // diameter 9999: min-label needs ~10k rounds; alternating-star is
    // O(log² n) and must finish well inside the default 25
    val n = 10000L
    val chain = (1L until n).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      // min-label at the SAME budget fails loudly — this is exactly the
      // adversarial shape the opt-in strategy exists for
      Clustering.connectedComponents(chain.toDF("d1", "d2"), maxIters = 25)
        .collect()
    }
    val got = ccStar(chain)
    assert(got.size === n)
    assert(got.values.toSet === Set(1L))
  }

  test("alternating-star matches min-label on random multi-component graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val pairs = Seq.fill(60)(
        (rnd.nextInt(40).toLong + 1, rnd.nextInt(40).toLong + 1))
      val viaStar = ccStar(pairs)
      val viaMin = cc(pairs)
      assert(viaStar === viaMin, s"trial $trial: $pairs")
    }
  }

  test("alternating-star handles disjoint components, self-pairs and empty input") {
    val got = ccStar(Seq((5L, 9L), (2L, 7L), (7L, 3L), (11L, 11L)))
    assert(got === Map(5L -> 5L, 9L -> 5L, 2L -> 2L, 7L -> 2L, 3L -> 2L,
      11L -> 11L))
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Clustering.connectedComponents(empty,
      strategy = Clustering.CcStrategy.AlternatingStar).count() === 0L)
  }

  test("clusterDedup keeps non-members and the min member of each component") {
    val docs = (1L to 6L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 4L), (5L, 6L)).toDF("d1", "d2")
    val kept = Clustering.clusterDedup(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    // component {1,2,4} -> keep 1; {5,6} -> keep 5; 3 untouched
    assert(kept == Set(1L, 3L, 5L))
  }

  test("empty pair set converges cleanly: no clusters, clusterDedup keeps every doc") {
    // a clean corpus produces ZERO near-dup pairs — the label sum must
    // coalesce to 0 (sum over no rows is null) instead of NPE-ing
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Clustering.connectedComponents(empty).count() === 0L)
    val docs = (1L to 4L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val kept = Clustering.clusterDedup(docs, empty, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (1L to 4L).toSet)
  }

  test("cluster query and oracle stay releasable: no storage pinned after collect") {
    // earlier tests (and other suites on the shared session) may still
    // hold GC-pending cached RDDs, so assert the DELTA of this one call:
    // the loop unpersists every round frame except the returned one
    val before = spark.sparkContext.getPersistentRDDs.size
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    Clustering.connectedComponents(pairs).collect()
    val delta = spark.sparkContext.getPersistentRDDs.size - before
    assert(delta <= 1, s"expected <=1 newly pinned RDD, got $delta")
  }
}
