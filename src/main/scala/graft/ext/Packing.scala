package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a curated corpus and the token
  * stream a training run actually consumes: documents are laid out in a
  * deterministic global order, the concatenated token stream is cut
  * into fixed-length training sequences, and every document learns
  * which sequence(s) its tokens land in. Downstream this drives the
  * physical shard layout (all docs of a sequence range into one file)
  * and the attention-masking metadata (a doc spanning sequences is the
  * boundary-crossing case packers audit).
  *
  * The core is an EXACT distributed prefix sum over a total order —
  * the textbook two-level scan, expressed relationally so Catalyst
  * plans it without any global single-partition window:
  *
  *   1. range-bucket the rows on the order key (monotone bucketing, so
  *      bucket boundaries respect the total order). Bucket cut points
  *      come from one `approxQuantile` pass (a mergeable sketch);
  *      their placement only shapes the EXECUTION layout — the final
  *      offsets are a property of the total order alone, so sketch
  *      wobble can never change a result.
  *   2. a per-bucket running sum (window bounded by the bucket's rows,
  *      ~n/B each — at 100 TB, B scales with the cluster and each
  *      window sort is one partition's worth of work).
  *   3. per-bucket totals (a combinable groupBy, B rows) turned into
  *      bucket base offsets by a running sum over that BOUNDED table —
  *      the repo's documented bounded-domain window exception (cf.
  *      Curation.tokenBudgetSelect) — then broadcast-joined back.
  *
  * No `collect`, no global sort, no unbounded window: the only
  * single-partition step touches ≤ `buckets` rows by construction.
  *
  * Relation to the battery's other packer (q_pack/q_pack_sharded in
  * ExtQueries): that one is greedy BIN packing — docs never split, bins
  * are per-(lang[,shard]) windows, and its globally-sequential form
  * carries a documented hot-group single-task caveat. This operator is
  * the other canonical layout — concatenate-and-chunk over ONE global
  * order, docs MAY cross sequence boundaries — and its prefix sum is
  * exactly the construction that removes the single-task caveat for
  * the global case.
  *
  * The reference has no packing/assembly story (it stops at parquet
  * link dumps, /root/reference/cc2dataset/main.py:383-391); this is a
  * beyond-reference capability, sibling to Assembly (split/mix/sample).
  */
object Packing {

  /** Append `outCol` = exact sum of `valueCol` over all rows STRICTLY
    * BEFORE this one in `orderCol` order (an exclusive prefix sum; the
    * first row gets 0).
    *
    * `orderCol` must be numeric-comparable and UNIQUE per row — the
    * prefix sum over a total order is only well-defined if the order
    * is total; ties would make "before" ambiguous and the result
    * partitioning-dependent.
    */
  def withPrefixSum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    // 1. monotone range bucketing from sketched quantiles. `distinct`
    // because a skewed key can repeat a cut point; the when-chain takes
    // the FIRST `v <= cut` in ascending cut order, so equal keys always
    // share a bucket and bucket id is monotone in the key.
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts: Array[Double] =
      if (buckets == 1) Array.empty
      else df.stat.approxQuantile(orderCol, probes, 0.001).distinct.sorted
    val key = col(orderCol).cast("double")
    val bucketExpr = cuts.zipWithIndex.foldRight(lit(cuts.length): Column) {
      case ((c, i), rest) => when(key <= c, i).otherwise(rest)
    }
    val bucketed = df.withColumn("_pk_bucket", bucketExpr)

    // 2. running sum within each bucket; the ROWS frame excludes the
    // current row, which is exactly the exclusive scan.
    val local = Window.partitionBy("_pk_bucket").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = bucketed.withColumn("_pk_local",
      coalesce(sum(col(valueCol)).over(local), lit(0L)))

    // 3. bucket base offsets: exclusive running sum over the ≤B-row
    // totals table (bounded-domain single-partition window), broadcast
    // back. The join key _pk_bucket is dense 0..B, so the broadcast is
    // B rows regardless of corpus size.
    val base = Window.orderBy("_pk_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("_pk_bucket")
      .agg(sum(col(valueCol)).as("_pk_tot"))
      .withColumn("_pk_off", coalesce(sum("_pk_tot").over(base), lit(0L)))
      .select("_pk_bucket", "_pk_off")

    withLocal.join(broadcast(offsets), "_pk_bucket")
      .withColumn(outCol, (col("_pk_off") + col("_pk_local")).cast("long"))
      .drop("_pk_bucket", "_pk_local", "_pk_off")
  }

  /** Pack documents into fixed-length training sequences of `seqLen`
    * tokens: concatenate docs in `idCol` order, cut every `seqLen`
    * tokens, and report each doc's placement —
    * `start_off` (its first token's global offset), `first_seq` /
    * `last_seq` (the sequence ids its tokens touch; a doc with
    * last_seq > first_seq crosses a packing boundary).
    *
    * `nTokens` must be strictly positive — a zero-length doc has no
    * tokens to place, and its "last token" offset would be start-1,
    * whose floor-vs-truncate division disagrees across engines at
    * offset 0. Callers drop empties first (whitespace tokenization
    * never produces 0: `split("")` is `[""]`).
    */
  def packSequences(df: DataFrame, idCol: String, nTokens: Column,
      seqLen: Long, buckets: Int = 64): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val sized = df.withColumn("n_tokens", nTokens.cast("long"))
      .where(col("n_tokens") > 0)
    withPrefixSum(sized, idCol, "n_tokens", "start_off", buckets)
      .withColumn("first_seq", expr(s"start_off div ${seqLen}L"))
      .withColumn("last_seq",
        expr(s"(start_off + n_tokens - 1) div ${seqLen}L"))
  }
}
