package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relative term scoring: TF-IDF keyword extraction and BM25
  * retrieval ranking (Robertson/Spärck Jones — public formulation, e.g.
  * "The Probabilistic Relevance Framework: BM25 and Beyond", 2009).
  *
  * Both run log-free in scaled integer arithmetic so results are
  * bit-identical cross-engine (the repo's oracle standard — DESIGN.md,
  * same idiom as Weighting.importanceScores): `ln` is correctly rounded
  * nowhere in SQL engines, so idf uses the exact rational forms
  * `N/df` (TF-IDF) and `(2N−2df+1)/(2df+1)` (the BM25 idf with the ±0.5
  * smoothing cleared to integers). Log damping changes scores
  * monotonically per-term; for per-document top-k extraction and
  * fixed-query ranking the integer forms rank identically per term and
  * keep every division floor-exact on both engines.
  *
  * Scale shape (100 TB):
  *  - tf is one explode + combinable count per (doc, term);
  *  - df aggregates OVER the tf rows (already one row per doc×term) —
  *    combinable, then joins back on the term key (AQE-skew-splittable;
  *    a stopword term is a hot KEY but contributes one row per doc, no
  *    per-key quadratic term — DESIGN.md rule 2);
  *  - corpus totals (N, Σdl) ride a 1-row broadcast cross join;
  *  - per-doc top-k is a rank window over the structurally bounded
  *    (terms-in-one-doc) partition, the allowed window shape.
  */
object Ranking {

  /** Per-document top-k terms by integer TF-IDF.
    *
    * score_milli = (tf × N × 1000) div df — tf·idf with the exact
    * rational idf N/df. Emits (doc_id, token, tf, df, score_milli, rk),
    * rk = 1..k by (score desc, token) — total order, engine-independent.
    */
  def tfIdfTopK(docs: DataFrame, idCol: Column, tokens: Column,
      k: Int): DataFrame = {
    val d = docs.select(idCol.as("doc_id"), tokens.as("tks"))
      .where(col("tks").isNotNull)
    val tf = d.select(col("doc_id"), explode(col("tks")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = d.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_milli").desc, col("token"))
    tf.join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn("score_milli", expr("tf * n_docs * 1000 div df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
      .select("doc_id", "token", "tf", "df", "score_milli", "rk")
  }

  /** BM25(k1 = 1.2, b = 0.75) of every document against a fixed query
    * term set, in milli-scaled integers:
    *
    *   idf_milli   = ((2N − 2df + 1) × 1000) div (2df + 1)
    *   inner_milli = 250 + (750 × dl × 1000) div avgdl_milli   // 1−b+b·dl/avgdl
    *   denom_milli = tf × 1000 + (1200 × inner_milli) div 1000 // + k1·inner
    *   term_milli  = (idf_milli × tf × 2200) div denom_milli   // tf·(k1+1)·idf
    *
    * The idf×tf×2200 product runs in decimal(38,0) (mirrored by HUGEINT
    * in the oracle) so a rare term in a 10^10-doc corpus cannot overflow
    * a 64-bit intermediate. Per-doc score = Σ term_milli over query
    * terms present. All operands positive → floor div == trunc div on
    * both engines.
    */
  def bm25(docs: DataFrame, idCol: Column, tokens: Column,
      queryTerms: Seq[String]): DataFrame = {
    val d = docs.select(idCol.as("doc_id"), tokens.as("tks"))
      .where(col("tks").isNotNull)
    val lens = d.select(col("doc_id"), size(col("tks")).cast("long").as("dl"))
    // N and avgdl_milli: one combinable agg, broadcast to every row
    val tot = lens.agg(count(lit(1)).as("n_docs"),
      expr("sum(dl) * 1000 div count(1)").as("avgdl_milli"))
    val tf = d.select(col("doc_id"), explode(col("tks")).as("token"))
      .where(col("token").isin(queryTerms: _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(df, "token")
      .join(lens, "doc_id")
      .crossJoin(broadcast(tot))
      .withColumn("idf_milli",
        expr("((2 * n_docs - 2 * df + 1) * 1000) div (2 * df + 1)"))
      .withColumn("inner_milli",
        expr("250 + (750 * dl * 1000) div avgdl_milli"))
      .withColumn("denom_milli",
        expr("tf * 1000 + (1200 * inner_milli) div 1000"))
      .withColumn("term_milli",
        expr("""cast(
                  cast(idf_milli as decimal(38,0)) * tf * 2200
                    div denom_milli
                as long)"""))
      .groupBy("doc_id")
      .agg(sum("term_milli").as("score_milli"),
        count(lit(1)).as("n_terms_hit"))
  }
}
