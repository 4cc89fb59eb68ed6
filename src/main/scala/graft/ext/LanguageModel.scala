package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model surprisal — the integer-exact
  * stand-in for the KenLM perplexity filter in CCNet-style pipelines
  * (Wenzek et al. 2019: score text by LM perplexity, keep the
  * low-perplexity head). The corpus itself is the training set: a
  * document full of common constructions scores low surprisal, word
  * salad scores high.
  *
  * Per-bigram surprisal in whole bits, floor-log2 exact on any engine:
  * ilog2(n) = length of n's binary representation − 1, computed as
  * `length(conv(n, 10, 2))` / `length(bin(n))` — no floating log
  * anywhere (ln/log2 are correctly rounded nowhere, the DESIGN.md
  * argument). bits(w1 w2) = ilog2(C1(w1)) − ilog2(C2(w1, w2)) ≥ 0
  * (a bigram never outnumbers its first word, and ilog2 is monotone),
  * the integer form of −log2 P(w2|w1) = log2 C1 − log2 C2.
  *
  * Scale shape (100 TB): one explode for bigrams (+ their first words
  * in the same pass); C1/C2 are combinable hash aggregations over the
  * exploded rows; both join-backs are equi on the hot-key-safe
  * groupBy+join idiom (DESIGN.md rule 2 — a stopword bigram is a hot
  * KEY with one row per occurrence, no per-key quadratic term); the
  * per-doc reduce is one (sum, count) aggregation. No windows.
  */
object LanguageModel {

  /** floor(log2(n)) for n >= 1, via binary-string length. */
  def ilog2(n: Column): Column = length(conv(n, 10, 2)) - 1

  def ilog2Sql(expr: String): String = s"(length(bin($expr)) - 1)"

  /** CCNet head/middle/tail bucketing (Wenzek et al. 2019 §4.3): split
    * the corpus into perplexity terciles — head = lowest-surprisal
    * third. Thresholds are EXACT rank-based quantiles computed without
    * any corpus-wide sort: cumulate counts over DISTINCT score values
    * (surprisal is milli-bit-quantized, so the score DOMAIN is bounded
    * — a window over it is a bounded-domain window, DESIGN.md rule 1,
    * regardless of corpus size), then t_p = min score whose cumulative
    * count reaches ceil(p·n). The two thresholds ride a 1-row
    * broadcast; bucketing is per-row.
    *
    * Output: (idCol, score_milli_bits, bucket) with bucket in
    * {head, middle, tail}.
    */
  def surprisalBuckets(docs: DataFrame, idCol: String, tokens: Column): DataFrame = {
    val scored = bigramSurprisal(docs, idCol, tokens)
      .select(col(idCol), col("score_milli_bits"))
    val dist = scored.groupBy("score_milli_bits")
      .agg(count(lit(1)).as("_c"))
    val cum = dist.withColumn("_cum",
      sum("_c").over(org.apache.spark.sql.expressions.Window
        .orderBy("score_milli_bits")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    val thresholds = cum
      .join(broadcast(scored.agg(count(lit(1)).as("_n"))))
      .agg(
        min(when(col("_cum") * 3 >= col("_n"), col("score_milli_bits")))
          .as("t1"),
        min(when(col("_cum") * 3 >= col("_n") * 2, col("score_milli_bits")))
          .as("t2"))
    scored.join(broadcast(thresholds))
      .select(col(idCol), col("score_milli_bits"),
        when(col("score_milli_bits") <= col("t1"), "head")
          .when(col("score_milli_bits") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Top collocations by integer pointwise mutual information: for
    * each bigram, lift_milli = (C2 × N × 1000) div (C1(w1·) × C1(·w2))
    * — the exact rational form of PMI's argument N·P(w1w2)/(P(w1)P(w2))
    * (log-free: log is monotone, so the ratio ranks identically and
    * stays bit-exact cross-engine; the DESIGN.md idiom). `minCount`
    * cuts singleton noise before the join-backs, which also bounds the
    * c2 side of every join.
    *
    * Scale shape: identical to [[bigramSurprisal]] (combinable counts,
    * equi join-backs) except grouped on the bigram TEXT — collocation
    * extraction must emit the phrase, and a string groupBy is the
    * topTerms precedent. N rides a 1-row broadcast. Counts here are
    * longs; a corpus where C2×N overflows 2^63 (≈ both over ~3×10^9)
    * needs the bm25 decimal(38,0) idiom.
    *
    * Output: (bigram, c2, c1a, c1b, lift_milli) top-k by
    * (lift desc, bigram).
    */
  def collocations(docs: DataFrame, idCol: String, tokens: Column,
      minCount: Int = 5, k: Int = 25): DataFrame = {
    val base = docs
      .where(col(idCol).isNotNull)
      .select(explode(Contamination.ngrams(tokens, 2)).as("bigram"))
      .select(col("bigram"),
        substring_index(col("bigram"), " ", 1).as("_w1"),
        substring_index(col("bigram"), " ", -1).as("_w2"))
      .where(col("bigram").isNotNull &&
        col("_w1").isNotNull && col("_w2").isNotNull)
    // ONE corpus pass: the (bigram, w1, w2) aggregation (w1/w2 are
    // functions of the bigram, so adding them to the group key changes
    // nothing) — marginal counts, the total, AND the c2 table all
    // derive from the tiny gram-space frame. The surprisal lesson one
    // op over: per-gram map compute is the entire cost of these
    // operators, so every avoided re-explode is a full corpus pass.
    val pair = base.groupBy("bigram", "_w1", "_w2")
      .agg(count(lit(1)).as("c2"))
    val c2 = pair.where(col("c2") >= minCount)
    val c1a = pair.groupBy("_w1").agg(sum("c2").as("c1a"))
    val c1b = pair.groupBy("_w2").agg(sum("c2").as("c1b"))
    val n = pair.agg(sum("c2").as("n_total"))
    c2.join(c1a, "_w1")
      .join(c1b, "_w2")
      .join(broadcast(n)) // 1-row cross, BNLJ by intent
      .select(col("bigram"), col("c2"), col("c1a"), col("c1b"),
        expr("(c2 * n_total * 1000) div (c1a * c1b)").as("lift_milli"))
      .orderBy(col("lift_milli").desc, col("bigram"))
      .limit(k)
  }

  /** (idCol, n_bigrams, total_bits, score_milli_bits) per document —
    * score = mean surprisal in milli-bits per bigram,
    * (1000 × Σ bits) div n_bigrams. Documents with < 2 tokens have no
    * bigrams and are absent (no text to model).
    */
  def bigramSurprisal(docs: DataFrame, idCol: String, tokens: Column): DataFrame = {
    val base = docs
      .where(col(idCol).isNotNull)
      .select(col(idCol), tokens.as("_tk"))
      .select(col(idCol),
        posexplode(Contamination.ngrams(col("_tk"), 2)))
      // hash AFTER the explode in a plain Project (the Contamination
      // shape: codegen'd, one evaluation); the bigram and its first
      // word (recovered by substring_index — one Generate, no array
      // zip) become 8-byte keys so both count shuffles and both
      // join-back shuffles carry 16-byte rows, not gram text
      .select(col(idCol),
        graft.functions.Hashing.h32(col("col")).as("bgh"),
        graft.functions.Hashing.h32(
          substring_index(col("col"), " ", 1)).as("w1h"))
      // constraints materialized at the source so the agg branches and
      // the join probe stay canonical twins (the ShuffleCountSpec
      // minReused lesson); h32 is never null, but the OPTIMIZER only
      // knows that if the filter is explicit
      .where(col("bgh").isNotNull && col("w1h").isNotNull)
    // ONE pair-grouped aggregation over the exploded stream; both count
    // tables then derive from the tiny gram-space frame (w1h is in the
    // GROUP KEY, not carried by min — exact even when two bigrams
    // collide on bgh, because the oracle merges those the same way).
    // This costs one extra gram-space agg but cuts the third full
    // explode+hash pass over the corpus — measured 10.6 s → ~7 s at
    // the ×10 probe, the op's cost being pure per-bigram map compute.
    val pairCounts = base.groupBy("bgh", "w1h")
      .agg(count(lit(1)).as("_cp"))
    val c2 = pairCounts.groupBy("bgh").agg(sum("_cp").as("c2"))
    val c1 = pairCounts.groupBy("w1h").agg(sum("_cp").as("c1"))
    base
      .join(c2, "bgh")
      .join(c1, "w1h")
      .select(col(idCol),
        (ilog2(col("c1")) - ilog2(col("c2"))).cast("long").as("bits"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("bits").as("total_bits"))
      .select(col(idCol), col("n_bigrams"), col("total_bits"),
        expr("(total_bits * 1000) div n_bigrams").as("score_milli_bits"))
  }
}
