package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a candidate-pair graph — the step that turns
  * near-duplicate PAIRS (lshNearDupPairs, Similarity.nearDupPairs) into
  * duplicate CLUSTERS so a pipeline can keep exactly one survivor per
  * group of mutual near-dups. Without it, pairwise dedup under-deletes:
  * A~B and B~C leaves {A,C} both alive even though they are transitively
  * the same document.
  *
  * Algorithm: min-label propagation. Every node starts labeled with
  * itself; each round every node takes the min over its own label and its
  * neighbors' labels; fixpoint = every node carries the component minimum.
  * Rounds needed = graph diameter. Near-dup graphs are short-diameter by
  * construction (components are quasi-cliques — documents that all share
  * LSH buckets), so propagation beats the O(log² n) alternating-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC '14) in practice while staying two shuffles per round.
  * For adversarial long-chain graphs raise `maxIters`; the loop FAILS
  * LOUDLY rather than returning silently-unconverged labels.
  *
  * Scale design (100 TB story):
  *  - Per round: one equi-join (edges ⋈ labels, hash shuffle on node) +
  *    one min-aggregation (map-side combinable). Both linear in |E|.
  *  - The edge list is persisted once; each round's label frame is
  *    persisted and the previous round's released, so round k+1 plans
  *    against a materialized cache, never a k-deep lazy lineage.
  *  - Convergence check rides the SAME action that materializes the
  *    round (a changed-label count), so rounds cost no extra pass.
  *  - Only nodes that appear in some pair participate: cluster state is
  *    O(duplicated docs), not O(corpus) — at 100 TB the duplicate graph
  *    is orders of magnitude smaller than the corpus itself.
  */
object Clustering {

  /** Strategy selector for [[connectedComponents]]. */
  sealed trait CcStrategy
  object CcStrategy {
    /** Min-label propagation — rounds = graph diameter. The default:
      * near-dup graphs are quasi-cliques (short diameter), where this
      * beats alternating-star on constant factors (two shuffles/round,
      * no edge-set rewrite).
      */
    case object MinLabel extends CcStrategy
    /** Alternating large-star/small-star (Kiveris et al., SoCC '14) —
      * O(log² n) rounds regardless of diameter. The escape hatch for
      * adversarial long-chain graphs where MinLabel's diameter-bounded
      * loop would hit `maxIters` (e.g. a 10k-node path converges here
      * in ~10 rounds vs 10k).
      */
    case object AlternatingStar extends CcStrategy
  }

  /** `pairs(d1, d2)` → `(doc_id, cluster_id)` where cluster_id is the
    * minimum doc id of the connected component. Only ids present in some
    * pair appear (singletons are trivially their own cluster — callers
    * union them in if needed, see [[clusterDedup]]).
    *
    * Each round's label frame is re-rooted at its cached RDD
    * (`createDataFrame(rdd, schema)`): `labels` is referenced twice per
    * round (own-label union, neighbor join), so persist alone — which
    * caches data but leaves the logical plan intact — would double the
    * plan per round and go exponential in analysis cost. Re-rooting
    * truncates the plan to a leaf, the standard shape for iterative
    * Spark algorithms. The RETURNED frame stays backed by its cached RDD
    * for the caller's action(s).
    *
    * Convergence detection: labels only ever DECREASE (each round takes
    * a min over a superset that includes the old label), so the exact
    * label sum strictly decreases until the fixpoint and is equal iff no
    * label moved. Comparing sums costs one map-side-combinable aggregate
    * on the frame the round must materialize anyway — where a
    * changed-row check would add a whole extra join against the previous
    * round's labels. decimal(38,0) keeps the sum exact (id sums overflow
    * a long at corpus scale).
    */
  def connectedComponents(pairs: DataFrame, d1: String = "d1",
      d2: String = "d2", maxIters: Int = 25,
      strategy: CcStrategy = CcStrategy.MinLabel,
      onRounds: Int => Unit = _ => ()): DataFrame =
    strategy match {
      case CcStrategy.MinLabel =>
        minLabelCC(pairs, d1, d2, maxIters, onRounds)
      case CcStrategy.AlternatingStar =>
        alternatingStarCC(pairs, d1, d2, maxIters, onRounds)
    }

  /** Plan-truncation helper for iterative algorithms: persist the frame's
    * RDD and re-root a new frame at it. Persist alone caches data but
    * leaves the logical plan intact, so a frame referenced twice per
    * round doubles the plan every round and goes exponential in analysis
    * cost; re-rooting truncates to a leaf.
    */
  private def rooted(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    // persist caches DATA but every task still serializes the full
    // nested RDD lineage; past ~60 rounds that chain overflows the task
    // deserializer's stack (StackOverflowError — surfaced by
    // CcScaleProbe's long-path sweep, invisible on ≤6-round near-dup
    // graphs). localCheckpoint truncates the lineage at this RDD once
    // the round's own action materializes it, bounding serialized task
    // depth to one round. Tradeoff (the standard iterative-graph
    // posture): an executor loss can no longer recompute earlier
    // rounds — the job fails and is rerun, instead of silently paying
    // a full-depth recompute.
    rdd.localCheckpoint()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  private def minLabelCC(pairs: DataFrame, d1: String,
      d2: String, maxIters: Int,
      onRounds: Int => Unit = _ => ()): DataFrame = {
    // persist PRE-PARTITIONED on the join key: every round equi-joins
    // edges on src, and an unpartitioned cache re-shuffles the full
    // |E|-sized edge set once per round (rounds × the largest byte
    // mover in the loop). InMemoryTableScan preserves its child's
    // outputPartitioning, so the per-round join only exchanges the
    // label side (O(nodes), re-rooted each round) — guide §2.4's
    // "operations keyed the same way share one exchange".
    val edges = pairs
      .select(col(d1).as("src"), col(d2).as("dst"))
      .union(pairs.select(col(d2).as("src"), col(d1).as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var (labels, labelsRdd) = rooted(
      edges.select(col("src").as("node"))
        .distinct()
        .withColumn("label", col("node")))

    // coalesce: sum over ZERO rows is null — an empty pair set (a clean
    // corpus) must converge on round 1 with sum 0, not NPE in compareTo
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)

    var prevSum = labelSum(labels) // also materializes the seed cache
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      // neighbor labels flow along edges; union with own label, take min
      val fromNeighbors = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
      val (next, nextRdd) = rooted(
        labels.union(fromNeighbors)
          .groupBy("node").agg(min("label").as("label")))
      // this aggregate is also the action that materializes `next`'s
      // cache; equal sums == fixpoint (labels only ever decrease)
      val nextSum = labelSum(next)
      labelsRdd.unpersist()
      labels = next
      labelsRdd = nextRdd
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iters += 1
    }
    edges.unpersist()
    if (!converged) {
      labelsRdd.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds — " +
          "graph diameter exceeds maxIters; raise it")
    }
    onRounds(iters)
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Alternating large-star/small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC '14, Algorithm 4).
    * Converges in O(log² n) rounds INDEPENDENT of graph diameter — the
    * opt-in strategy for adversarial long-chain graphs where min-label
    * propagation (rounds = diameter) would hit `maxIters`.
    *
    * Edge set is kept CANONICAL throughout: (src, dst) with src > dst,
    * distinct, no self-loops. Per round:
    *  - large-star: every node u computes m = min(Γ⁺(u)) over the
    *    symmetric neighborhood and re-points each LARGER neighbor
    *    v > u at m (one groupBy + one join on src);
    *  - small-star: every node u re-points itself and its smaller
    *    neighbors at m = min(N≤(u) ∪ {u}) (same shape).
    *  Both emissions satisfy new_src > new_dst by construction (m is a
    *  minimum), so canonical form is preserved without re-sorting.
    *
    * Fixpoint = the edge set is EXACTLY the star forest rooted at
    * component minima; detected by set equality (|E'| = |E| and
    * E' \ E = ∅ — both sides are distinct frames). The equality check
    * is one extra anti-join per round over the EDGE frame — affordable
    * because near-dup edge sets are orders of magnitude smaller than
    * the corpus, and (unlike min-label's monotone label sum) no cheap
    * monotone witness exists for the star fixpoint: an edge rewrite can
    * leave every per-node minimum unchanged, so a label-sum check would
    * declare convergence early.
    *
    * Same persist/re-root lineage discipline and fail-loud `maxIters`
    * as [[minLabelCC]]; same output contract (every node appearing in
    * some pair, labeled with its component minimum).
    */
  private def alternatingStarCC(pairs: DataFrame, d1: String,
      d2: String, maxIters: Int,
      onRounds: Int => Unit = _ => ()): DataFrame = {
    val sym = pairs
      .select(col(d1).as("src"), col(d2).as("dst"))
      .union(pairs.select(col(d2).as("src"), col(d1).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // node universe is fixed up front: self-paired nodes carry no
    // canonical edge but must still appear in the output (as their own
    // cluster), exactly as in min-label. Materialize it NOW — sym is
    // unpersisted before the caller's first action, and a lazy nodes
    // frame would recompute the corpus-sized symmetrize+distinct then.
    val (nodes, nodesRdd) = rooted(
      sym.select(col("src").as("node")).distinct())
    nodesRdd.count()

    def largeStar(e: DataFrame): DataFrame = {
      val s = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = s.groupBy("src")
        .agg(least(min(col("dst")), col("src")).as("m"))
      // m = min(Γ⁺(u)); re-point every larger neighbor at it
      s.join(mins, "src")
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // canonical e: dst < src, so dst IS the ≤-neighborhood
      val mins = e.groupBy("src").agg(min(col("dst")).as("m"))
      val withM = e.join(mins, "src")
      withM.select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
    }

    var (edges, edgesRdd) = rooted(
      sym.where(col("src") > col("dst")))
    var edgeCount = edges.count()
    var converged = edgeCount == 0L
    var iters = 0
    while (!converged && iters < maxIters) {
      val (next, nextRdd) = rooted(smallStar(largeStar(edges)))
      val nextCount = next.count() // materializes the round's cache
      converged = nextCount == edgeCount &&
        next.except(edges).isEmpty
      edgesRdd.unpersist()
      edges = next
      edgesRdd = nextRdd
      edgeCount = nextCount
      iters += 1
    }
    if (!converged) {
      edgesRdd.unpersist(); nodesRdd.unpersist(); sym.unpersist()
      throw new IllegalStateException(
        s"alternatingStarCC did not converge in $maxIters rounds — " +
          "raise maxIters (expected O(log² n) rounds)")
    }
    onRounds(iters)
    // star fixpoint: every non-root points at exactly its component
    // minimum; roots (and self-paired singletons) don't appear as src
    val out = nodes
      .join(edges.groupBy("src").agg(min(col("dst")).as("_lab"))
          .withColumnRenamed("src", "node"),
        Seq("node"), "left")
      .select(col("node").as("doc_id"),
        coalesce(col("_lab"), col("node")).as("cluster_id"))
    sym.unpersist()
    out
  }

  /** Fuzzy dedup, completed: keep every document that is either outside
    * the duplicate graph or the minimum-id member of its component.
    * `docs` must carry `idCol`; `pairs(d1, d2)` as above.
    */
  def clusterDedup(docs: DataFrame, pairs: DataFrame, idCol: String,
      maxIters: Int = 25): DataFrame = {
    val losers = connectedComponents(pairs, maxIters = maxIters)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware cluster dedup: keep each duplicate cluster's
    * BEST-scoring member (ties to the smallest id) instead of
    * [[clusterDedup]]'s min-label representative — "keep the best
    * duplicate, not the first". Docs outside the duplicate graph are
    * their own singleton cluster and always survive.
    *
    * Survivor selection is a combinable `max_by((score, -id))`
    * aggregation per cluster — hot-cluster-safe (a boilerplate cluster
    * is many rows through map-side partials, never one partition's
    * window), the [[graft.ops.Dedup.firstPerKeyAgg]] standard.
    */
  def clusterBest(docs: DataFrame, pairs: DataFrame, idCol: String,
      scoreCol: String, maxIters: Int = 25): DataFrame = {
    val labels = connectedComponents(pairs, maxIters = maxIters)
      .withColumnRenamed("doc_id", idCol)
    val labeled = docs
      .join(labels, Seq(idCol), "left")
      .withColumn("_cl", coalesce(col("cluster_id"), col(idCol)))
      .drop("cluster_id")
    val winners = labeled.groupBy("_cl")
      .agg(max_by(col(idCol), struct(col(scoreCol), -col(idCol)))
        .as("_win"))
    labeled.join(winners, "_cl")
      .where(col(idCol) === col("_win"))
      .drop("_cl", "_win")
  }
}
