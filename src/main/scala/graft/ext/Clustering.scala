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
      d2: String = "d2", maxIters: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs
      .select(col(d1).as("src"), col(d2).as("dst"))
      .union(pairs.select(col(d2).as("src"), col(d1).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    def rooted(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(rdd, df.schema), rdd)
    }

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
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
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
}
