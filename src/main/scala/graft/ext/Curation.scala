package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.Dedup

/** End-to-end training-data curation: quality filter → exact (bag)
  * dedup → verified near-dup removal. The composition every LLM-data
  * pipeline runs, built solely from the oracle-proven pieces:
  *
  *   1. quality gate: TextAnalysis.qualityScore ≥ minScore, ≥ minTokens
  *   2. exact near-dup: one survivor per bag-fingerprint
  *      (order-insensitive vocabulary match), deterministic min-doc_id
  *   3. fuzzy near-dup: blocked bigram-shingle Jaccard pairs
  *      (inverted-index join) — the lower doc_id of each verified pair
  *      survives
  *
  * Every stage is a shuffle-bounded relational op (filters are
  * per-row; dedup is one hash shuffle; Jaccard never goes pairwise over
  * the corpus), so the composition holds at 100 TB.
  */
object Curation {

  final case class Config(
      minTokens: Long = 20L,
      minScore: Double = 0.575,
      blockChars: Long = 50L,
      minJaccard: Double = 0.6)

  /** documents(doc_id, text, lang, n_chars) → curated
    * (doc_id, lang, n_tokens, score), for single-shot callers: the
    * curated result (pruned to the 4 output columns — far smaller than
    * the dedup lineage) is materialized into its own cache and the
    * internal lineage cache is released EAGERLY, so repeated calls never
    * accumulate pinned lineage storage. The returned frame stays
    * persisted for the caller's action(s) — `.unpersist()` it when done.
    * Long-lived sessions wanting lazy composition should use
    * [[curateManaged]] and release explicitly.
    */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val (curated, release) = curateManaged(docs, cfg)
    val out = curated.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    release()
    out
  }

  /** [[curate]] plus a release handle: invoke it after the curated
    * result has been fully consumed (written/collected) to unpersist
    * the internal cache — otherwise each call pins executor storage
    * until session shutdown or LRU eviction.
    */
  def curateManaged(docs: DataFrame,
      cfg: Config = Config()): (DataFrame, () => Unit) = {
    val text = col("text")
    val scored = docs.select(
      col("doc_id"), col("lang"), col("n_chars"), text,
      TextAnalysis.tokenCount(text).as("n_tokens"),
      TextAnalysis.distinctTokenCount(text).as("nd"),
      TextAnalysis.alphaChars(text).as("ac"),
      TextAnalysis.stopwordHits(text).as("sh"))
      .withColumn("score", TextAnalysis.qualityScore(
        col("n_tokens"), col("nd"), col("sh"), col("ac"), col("n_chars")))

    val kept = scored
      .where(col("score") >= cfg.minScore && col("n_tokens") >= cfg.minTokens)
      .withColumn("bag_fp", TextAnalysis.bagFingerprint(text))

    // `exact` feeds BOTH the pair-finding subtree and the final anti-join;
    // without a persist the whole quality+dedup lineage executes twice per
    // action — a free 2× on a full-corpus curation run. Prune to the
    // columns both consumers need before caching (the scoring
    // intermediates and bag_fp would dominate the cached bytes), and use
    // MEMORY_AND_DISK so oversized partitions spill instead of OOM-ing at
    // scale. Cache scope is the curated plan's lifetime; callers doing
    // repeated actions over the result should persist that result
    // themselves.
    // hot-key-safe survivor pick: bag_fp is content-derived, so a
    // boilerplate vocabulary repeated corpus-wide is a degenerate key —
    // min_by partials collapse it map-side where a row_number window
    // would single-task-sort the whole group (and pay an in-partition
    // sort even unskewed)
    val exact = Dedup
      .firstPerKeyAgg(kept, Seq(col("bag_fp")), Seq(col("doc_id")))
      .select("doc_id", "lang", "n_chars", "text", "n_tokens", "score")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val blocked = exact.select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / cfg.blockChars).cast("long").as("bucket"),
      NearDup.bigramShingles(TextAnalysis.tokens(text)).as("sh"))
    val drops = NearDup.jaccardPairs(blocked, cfg.minJaccard)
      .select(col("d2").as("doc_id")).distinct()

    val curated = exact.join(drops, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "n_tokens", "score")
    (curated, () => { exact.unpersist(); () })
  }

  /** Token-budget corpus selection — "give me the best B tokens": admit
    * quality-score classes from the top down while their cumulative
    * token count fits the budget. The greedy-by-quality selection every
    * pretraining data refresh runs, WITHOUT a corpus-wide sort: the
    * [[QualityModel.hashedScore]] score is integer milli over a BOUNDED
    * domain (≤ 2001 classes + bias), so the cumulative runs as a
    * single-partition window over the DISTINCT class table (the
    * q_ppl_buckets idiom — DESIGN.md's bounded-domain window
    * exception), and the tiny admit table broadcasts back onto the
    * corpus. A class is admitted only if it fits WHOLE — deterministic
    * and engine-exact; the boundary class stays out rather than being
    * split by an arbitrary tie-break.
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, tokens: Column,
      budgetTokens: Long, biasMilli: Long = 50L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = QualityModel.hashedScore(docs, idCol, tokens, biasMilli)
      .select(col(idCol), col("n_tokens"), col("score_milli"))
    val flags = scored.groupBy("score_milli")
      .agg(sum(col("n_tokens")).as("_ct"))
      .withColumn("_cum", sum(col("_ct")).over(
        Window.orderBy(col("score_milli").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("score_milli"), (col("_cum") <= budgetTokens).as("selected"))
    scored.join(broadcast(flags), Seq("score_milli"))
      .select(col(idCol), col("n_tokens"), col("score_milli"),
        col("selected"))
  }
}
