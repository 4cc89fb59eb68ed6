package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Dataset-assembly operators — the last mile between a curated corpus
  * and a training run: deterministic split assignment, source-weighted
  * mixing, and per-document top terms.
  *
  * Everything is per-row arithmetic over the shared cross-engine h32
  * hash (no RNG state): the same document lands in the same split/
  * replica set on every run, every engine, every partitioning — the
  * property that makes a 100 TB materialization resumable and
  * auditable.
  */
object Assembly {

  /** Deterministic split assignment from cumulative percentage cuts:
    * `cuts = Seq("train" -> 90, "val" -> 95)` sends h32-percentiles
    * [0,90) to train, [90,95) to val, the rest to `last`. Pure per-row
    * expression; at scale this is a free column on the write path
    * (partitionBy("split") gives physically separated outputs).
    */
  def splitColumn(key: Column, salt: String,
      cuts: Seq[(String, Int)], last: String): Column = {
    // strictly increasing and inside (0,100): duplicate cuts would make a
    // split name unreachable, and a cut >= 100 would silently starve
    // every later split and `last`
    require(cuts.nonEmpty &&
      cuts.map(_._2).sliding(2).forall(s => s.size < 2 || s(0) < s(1)) &&
      cuts.forall { case (_, c) => c > 0 && c < 100 },
      "cuts must be strictly increasing cumulative percentages in (0,100)")
    val pct = Hashing.h32(concat(lit(salt + "|"), key.cast("string"))) % 100
    cuts.foldRight(lit(last): Column) { case ((name, cut), rest) =>
      when(pct < cut, name).otherwise(rest)
    }
  }

  /** Source-weighted replication for training-mix assembly: weight
    * 2500 (milli-units = 2.5x) emits 2 whole replicas of every row plus
    * a third for the deterministic half of rows whose fractional hash
    * lands under .5. Weight 0 drops the source. One generator, no
    * shuffle — the canonical "upsample Wikipedia 3x, downsample CC to
    * 0.1x" mix step, reproducible across runs and engines.
    *
    * Output: the input row repeated with `replica` = 0..k-1.
    */
  def weightedReplicas(df: DataFrame, keyCol: String, weightMillis: Column,
      salt: String = "mix"): DataFrame = {
    val whole = (weightMillis / 1000L).cast("long")
    val fracMillis = weightMillis % 1000L
    val extra = when(
      Hashing.h32(concat(lit(salt + "|"), col(keyCol).cast("string")))
        % 1000 < fracMillis, 1L).otherwise(0L)
    val k = (whole + extra).cast("int")
    df.withColumn("_k", k)
      .where(col("_k") > 0)
      .withColumn("replica",
        explode(transform(sequence(lit(0), col("_k") - 1),
          i => i.cast("long"))))
      .drop("_k")
  }

  /** Deterministic weighted sampling WITHOUT replacement — priority
    * sampling (Duffield/Lund/Thorup, JACM 2007): each row gets priority
    * q = w / u with u uniform in (0, 1], and the k highest-priority
    * rows form the sample (inclusion probability ≈ proportional to
    * weight, heavy items near-certain). Here u is the seeded per-key
    * hash fraction (h32+1)/2^32, so the "randomness" is reproducible
    * on any engine and re-runs pick the SAME sample — the repo's
    * hash-sampling standard (q_hash_sample) extended to weights.
    *
    * priority = (w_milli << 32) div (h32(salt|key) + 1), exact integer.
    * The multiply runs in decimal(38,0) (the bm25 idiom) so it cannot
    * overflow for ANY weight — byte-length-weighted corpora can exceed
    * 2^31 milli, where a plain int64 multiply would wrap; `div`'s
    * conversion of the exact quotient back to bigint is ANSI-checked,
    * so a weight pathological enough that the PRIORITY itself exceeds
    * int64 fails loudly instead of silently corrupting the ordering.
    * One per-row projection + TakeOrdered top-k: no shuffle at any
    * size.
    */
  def prioritySample(df: DataFrame, keyCol: String, weightMillis: Column,
      k: Int, salt: String = "ps"): DataFrame = {
    val h = Hashing.h32(concat(lit(salt + "|"), col(keyCol).cast("string")))
    df.withColumn("_w", weightMillis.cast("long"))
      .where(col("_w") > 0)
      .withColumn("_h", h)
      .withColumn("priority",
        expr(s"cast(_w as decimal(38,0)) * ${1L << 32} div (_h + 1)"))
      .drop("_w", "_h")
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
  }

  /** Per-document top-k terms ranked by an ALL-INTEGER tf-idf ordering:
    * term frequency DESC (more of the document), document frequency ASC
    * (rarer in the corpus), token ASC (total tie-break). Integer ranking
    * carries the same signal as tf·log(N/df) without cross-engine float
    * risk.
    *
    * Shape: one (doc, token) aggregation, document frequency as a
    * COMBINABLE `groupBy(token).count()` joined back onto the tf rows,
    * one per-doc rank window (bounded by document vocabulary). The df
    * side MUST NOT be a `count over Window.partitionBy(token)`: a
    * stopword's group is corpus-document-count-sized and a window has no
    * map-side partial — at 100 TB that is a single-task sort over ~every
    * document. The groupBy collapses the hot token in map-side partials;
    * the join-back on token is AQE-skew-splittable (the df side is one
    * row per token, so replicating it across split partitions is free).
    */
  def topTerms(docs: DataFrame, idCol: String, tokens: Column,
      k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(tokens).as("token"))
      // null tokens are not terms — and the df join-back below would
      // silently drop them mid-pipeline otherwise (null keys never
      // equi-join); make the semantics explicit instead
      .where(col("token").isNotNull)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfCounts = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val withDf = tf.join(dfCounts, "token")
    val w = Window.partitionBy(idCol)
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    withDf
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select(col(idCol), col("rk"), col("token"), col("tf"), col("df"))
  }
}
