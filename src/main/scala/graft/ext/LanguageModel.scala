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
    val c2 = base.groupBy("bgh").agg(count(lit(1)).as("c2"))
    val c1 = base.groupBy("w1h").agg(count(lit(1)).as("c1"))
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
