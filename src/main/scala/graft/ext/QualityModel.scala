package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Linear bag-of-words quality classifier — the fastText-shaped model
  * behind most production pretraining quality filters (Joulin et al.
  * 2016: hashed token features, linear weights, mean pooling): each
  * token contributes an integer milli-weight, a document's score is the
  * floor-mean over its token stream plus a bias, and the keep/drop label
  * is the score's sign. All arithmetic is integer (the DESIGN.md
  * cross-engine standard), so scores are bit-identical on any engine.
  *
  * Two weight sources:
  *  - [[scoreWithWeights]]: a trained weight table (token → milli
  *    weight), broadcast-joined — the production form. OOV tokens weigh
  *    zero, like a hashed model that never saw them.
  *  - [[hashedScore]]: weights derived from h32 of the token — no model
  *    file, fully reproducible in SQL, the oracle-checkable instance
  *    (and an honest stand-in: a hash-bucketed linear model IS what
  *    fastText does, just with trained values in the buckets).
  *
  * Scale shape (100 TB): one explode, per-token weight in a codegen'd
  * Project (hashed) or against a broadcast table (trained), then ONE
  * combinable (sum, count) aggregation per document. No shuffle other
  * than the per-doc agg; no window.
  */
object QualityModel {

  /** Deterministic pseudo-trained milli-weight in [-1000, 1000]:
    * h32("qw|" + token) % 2001 - 1000. */
  def hashedWeight(token: Column): Column =
    Hashing.h32(concat(lit("qw|"), token)) % 2001 - 1000

  def hashedWeightSql(tokenExpr: String): String =
    s"${Hashing.h32Sql(s"'qw|' || $tokenExpr")} % 2001 - 1000"

  /** (idCol, n_tokens, score_milli, label) per document; score_milli =
    * (biasMilli + Σ w(token)) div n_tokens, label = keep iff >= 0.
    * Documents whose token array is empty or null are dropped (a
    * no-token doc has no features — callers gate those upstream;
    * `split` never returns an empty array, so text corpora keep every
    * row).
    */
  def hashedScore(docs: DataFrame, idCol: String, tokens: Column,
      biasMilli: Long = 0L): DataFrame =
    finish(
      docs.where(col(idCol).isNotNull)
        .select(col(idCol), explode(tokens).as("_tok"))
        .select(col(idCol), hashedWeight(col("_tok")).as("_w")),
      idCol, biasMilli)

  /** Trained-weight form: `weights` is (token, w_milli); OOV → 0. The
    * weight table broadcasts (a vocabulary is bounded; 1M rows × 16 B
    * is nothing next to a corpus scan).
    */
  def scoreWithWeights(docs: DataFrame, idCol: String, tokens: Column,
      weights: DataFrame, biasMilli: Long = 0L): DataFrame = {
    val w = weights.toDF("_tok", "_wv")
    finish(
      docs.where(col(idCol).isNotNull)
        .select(col(idCol), explode(tokens).as("_tok"))
        .join(broadcast(w), Seq("_tok"), "left")
        .select(col(idCol), coalesce(col("_wv"), lit(0L)).as("_w")),
      idCol, biasMilli)
  }

  /** Feature-hashing document embedding (Weinberger et al., "Feature
    * Hashing for Large Scale Multitask Learning", ICML 2009 — the
    * fastText input layer): dims integer components, component j =
    * Σ_tokens (h32("e{j}|" + token) % 2001 − 1000). No vocabulary, no
    * model file, bit-exact on any engine — the cheap on-ramp that
    * turns a text corpus into vectors for the ANN/semantic-dedup
    * stack when no trained encoder is at hand.
    *
    * Shape: one explode; all dims hashed in ONE codegen'd Project
    * (never inside an array lambda — the InferFiltersFromGenerate
    * re-evaluation trap); one combinable multi-sum aggregation.
    * Output: (idCol, v0..v{dims-1}).
    */
  def hashedEmbedding(docs: DataFrame, idCol: String, tokens: Column,
      dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims $dims outside [1, 64]")
    val exploded = docs.where(col(idCol).isNotNull)
      .select(col(idCol), explode(tokens).as("_tok"))
    val withDims = exploded.select(
      col(idCol) +: (0 until dims).map { j =>
        (Hashing.h32(concat(lit(s"e$j|"), col("_tok"))) % 2001 - 1000)
          .as(s"_w$j")
      }: _*)
    withDims.groupBy(idCol)
      .agg(sum(s"_w0").as("v0"),
        (1 until dims).map(j => sum(s"_w$j").as(s"v$j")): _*)
  }

  def hashedEmbeddingSql(j: Int, tokenExpr: String): String =
    s"${Hashing.h32Sql(s"'e$j|' || $tokenExpr")} % 2001 - 1000"

  private def finish(tokenWeights: DataFrame, idCol: String,
      biasMilli: Long): DataFrame =
    tokenWeights
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("_w").as("_wsum"))
      // integral `div`, not `/`: Divide casts to double; div keeps the
      // floor-exact integer the oracle's `//` computes
      .select(col(idCol), col("n_tokens"),
        expr(s"(_wsum + $biasMilli) div n_tokens").as("score_milli"))
      .withColumn("label",
        when(col("score_milli") >= 0, "keep").otherwise("drop"))
}
