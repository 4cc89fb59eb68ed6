package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Duplication-aware sample weighting — the "soft dedup" alternative to
  * dropping duplicates: every copy survives, but each carries weight
  * 1/copies, so a document duplicated a thousand times contributes one
  * document's worth of training signal. Pipelines reach for this when a
  * hard dedup would distort the source mix or when the trainer consumes
  * per-example weights anyway (the SlimPajama-style duplication
  * discount).
  *
  * Scale design: copies-per-key is ONE combinable groupBy count (map-
  * side partials collapse a corpus-wide boilerplate key per task); the
  * join-back is AQE-skew-splittable because the count side is exactly
  * one row per key. Weights are integer milli-units (floor of
  * scaleMilli / copies) — bit-identical across engines, no float drift
  * in a number that multiplies gradients.
  */
object Weighting {

  /** Attach `copies` (rows sharing this row's `keys`) and
    * `weight_milli` (= scaleMilli / copies, integer floor) to every
    * row. Keys are usually a content fingerprint
    * ([[TextAnalysis.bagFingerprint]], a uid, a canonical URL).
    */
  def softDedupWeights(df: DataFrame, keys: Seq[String],
      scaleMilli: Long = 1000L): DataFrame = {
    require(keys.nonEmpty, "softDedupWeights needs at least one key")
    val reserved = keys.map(k => s"__cnt_$k") ++ Seq("copies", "weight_milli")
    require(!reserved.exists(df.columns.contains),
      s"softDedupWeights writes ${reserved.mkString("/")} — " +
        "input must not carry them")
    val counts = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("copies"))
      .withColumnsRenamed(keys.map(k => k -> s"__cnt_$k").toMap)
    // NULL-SAFE equality: "every copy survives" must include rows with
    // a null key (e.g. a fingerprint of absent text) — a plain
    // equi-join would silently DELETE them, the one thing a soft dedup
    // promises not to do. groupBy already treats null as a group.
    val cond = keys.map(k => df(k) <=> counts(s"__cnt_$k"))
      .reduce(_ && _)
    df.join(counts, cond)
      .drop(keys.map(k => s"__cnt_$k"): _*)
      // integral div, not `/`: Divide casts to double, and a caller's
      // large scaleMilli would break the promised cross-engine
      // bit-identity with the oracle's exact integer division
      .withColumn("weight_milli", expr(s"$scaleMilli div copies"))
  }

  /** Attach a DATA-derived constant join key: the non-foldable zero
    * (`x * 0`, never `lit(0)`) that lets a 1-row totals frame ride a
    * broadcast HASH join — a foldable literal key constant-folds the
    * join condition to `true` and degrades the plan back to the
    * BroadcastNestedLoopJoin that PlanAuditSpec forbids.
    */
  private def withConstKey(df: DataFrame, from: String): DataFrame =
    df.withColumn("_k", (col(from) * 0L).cast("int"))

  /** Temperature-balanced source weights at α = 1/2 — the multilingual
    * mix-balancing step (sampling probability ∝ n^α flattens the
    * head): each group's weight_milli is
    * `(floor(sqrt(n)) * scaleMilli) div Σ floor(sqrt(n))`, clamped to
    * at least 1. Note the floor happens BEFORE scaling (so n = 1..3
    * all weigh as sq = 1 — a coarse staircase for tiny groups), and
    * the clamp exists because a vanishing tail share would otherwise
    * round to weight 0 and [[weightedReplicas]] would then DELETE the
    * very low-resource group this operator exists to protect. α is
    * FIXED at 1/2 because IEEE-754 sqrt is correctly rounded, so
    * floor(sqrt(n)) is bit-identical on every engine for n < 2^53 — a
    * general pow(n, α) is not, and this library's determinism policy
    * excludes it.
    *
    * One combinable count + a 1-row broadcast total — nothing here
    * scales with the corpus beyond the first aggregation.
    */
  def temperatureWeights(df: DataFrame, groupCol: String,
      scaleMilli: Long = 1000L): DataFrame = {
    val written = Seq("n_docs", "_s", "_k", "weight_milli")
    require(!written.exists(c => df.columns.contains(c) || groupCol == c),
      s"temperatureWeights writes ${written.mkString("/")} — " +
        "input must not carry them")
    val s = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("_s", floor(sqrt(col("n_docs"))).cast("long"))
    val total = withConstKey(s.agg(sum(col("_s")).as("_t")), "_t")
    withConstKey(s, "_s")
      .join(broadcast(total), "_k")
      .select(col(groupCol), col("n_docs"),
        greatest(expr(s"(_s * $scaleMilli) div _t"), lit(1L))
          .as("weight_milli"))
  }

  /** Hashed-feature importance scoring — the data-SELECTION step (the
    * DSIR idea, Xie et al. 2023, arXiv:2302.03169): score every corpus
    * document by how much its hashed unigram distribution resembles a
    * small TARGET set (curated wiki, a benchmark's domain) relative to
    * the raw corpus, so a pipeline can sample high-scoring docs and
    * shift the mix toward the target domain without a trained model.
    *
    * This is the ALL-INTEGER variant: each hash bucket gets
    * `ratio_milli = floor(tb * Ct * scale / (cb * Tt))` — the target/
    * corpus relative frequency in milli-units (>1000 = over-represented
    * in the target) — and a document scores the count-weighted MEAN of
    * its buckets' ratios. Same ordering signal as the log-likelihood
    * ratio for deciding "more target-like than not", with zero float
    * drift across engines (exact `div` on decimals; products stay far
    * under decimal(38,0) — tb*Ct*scale ~ 1e26 at a 100 TB corpus).
    *
    * Scale design: one explode feeds per-(doc,bucket) counts (`dbt`,
    * combinable); bucket totals are a second combinable aggregation
    * over dbt; the target side is small by definition; totals broadcast
    * as 1-row frames; the scoring join is (dbt ⋈ ratios) on the bucket
    * key — hot buckets (stopwords) are AQE-skew-splittable because the
    * ratio side is one row per bucket. Nothing re-reads the raw corpus
    * twice; dbt is the widest thing shuffled. Documents with zero
    * tokens have no distribution and are absent from the output.
    *
    * Returns (idCol, n_tok, importance_milli).
    */
  def importanceScores(corpus: DataFrame, idCol: String, tokens: Column,
      target: DataFrame, targetTokens: Column, buckets: Int = 65536,
      scaleMilli: Long = 1000L): DataFrame = {
    val dbt = corpus
      .select(col(idCol), explode(tokens).as("tok"))
      .select(col(idCol),
        pmod(Hashing.h32(col("tok")), lit(buckets.toLong)).as("b"))
      // explicit, not inference-dependent: cb is consumed by BOTH the
      // total (plain agg — no constraints) and the ratio join (infers
      // isnotnull(b)); divergent twin subtrees lose AQE exchange reuse
      // and re-run the token explode per branch (the round-8
      // Contamination lesson, found by ReuseAudit). A null bucket (null
      // token) was inconsistent anyway: counted in cb totals but
      // dropped by the inner ratio join.
      .where(col("b").isNotNull)
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val cb = dbt.groupBy("b").agg(sum(col("cnt")).as("cb"))
    val tb = target
      .select(explode(targetTokens).as("tok"))
      .select(pmod(Hashing.h32(col("tok")), lit(buckets.toLong)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("tb"))
    // totals ride constant-key broadcast equi-joins via withConstKey
    // (BroadcastHashJoin, never a nested-loop cross product)
    val cTotal = withConstKey(cb.agg(sum(col("cb")).as("ct_total")),
      "ct_total")
    val tTotal = withConstKey(tb.agg(sum(col("tb")).as("tt_total")),
      "tt_total")
    val ratios = withConstKey(
      cb.join(tb, Seq("b"), "left").na.fill(0L, Seq("tb")), "cb")
      .join(broadcast(cTotal), "_k")
      .join(broadcast(tTotal), "_k")
      .select(col("b"), expr(
        s"""CAST((CAST(tb AS DECIMAL(38,0)) * CAST(ct_total AS DECIMAL(38,0))
           | * $scaleMilli) div
           | (CAST(cb AS DECIMAL(38,0)) * CAST(tt_total AS DECIMAL(38,0)))
           | AS BIGINT)""".stripMargin.replace("\n", " "))
        .as("ratio_milli"))
    dbt.join(ratios, "b")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_tok"),
        sum(col("cnt") * col("ratio_milli")).as("sum_ratio"))
      .select(col(idCol), col("n_tok"),
        expr("CAST(sum_ratio div n_tok AS BIGINT)").as("importance_milli"))
  }
}
