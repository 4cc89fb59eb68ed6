package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Positional phrase search — the inverted-index IR primitive: find
  * every document containing an exact token phrase, with match counts,
  * via positional posting alignment. Each phrase word w_i selects its
  * postings (doc, pos − i); a phrase occurrence is one (doc, p0) key
  * present in ALL lists, so the phrase is a chain of equi-joins on
  * (doc, aligned position) — never a regex scan over full text, and
  * never a join on the (hot) token value: the join key is (doc, pos),
  * uniformly distributed even when every phrase word is a stopword.
  *
  * Scale shape (100 TB): one posexplode; the per-word posting lists
  * are FILTERS over the same exploded stream (token equality reaches
  * the scan stage, so non-phrase tokens never shuffle); k−1 equi-joins
  * on fine-grained keys; one combinable per-doc count.
  */
object Search {

  /** (idCol, n_matches) for documents containing `phrase` at least
    * once; n_matches counts distinct start positions.
    *
    * ONE corpus pass (DESIGN.md rule 8 — the first version joined k
    * per-word posting frames, i.e. k scans): each exploded token
    * broadcast-joins the tiny (word, offset) phrase table — a token
    * occurring at several phrase offsets contributes one row per
    * offset — and a start position p0 = pos − offset is a match iff
    * ALL k offsets appear in its group. `isin` prunes non-phrase
    * tokens before the join.
    */
  def phraseMatches(docs: DataFrame, idCol: String, tokens: Column,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val spark = docs.sparkSession
    import spark.implicits._
    val phraseTable = phrase.zipWithIndex
      .map { case (w, i) => (w, i.toLong) }.toDF("token", "_off")
    docs
      .where(col(idCol).isNotNull)
      .select(col(idCol), posexplode(tokens))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("col").as("token"))
      .where(col("token").isin(phrase.distinct: _*))
      .join(broadcast(phraseTable), "token")
      .select(col(idCol), (col("pos") - col("_off")).as("p0"), col("_off"))
      .where(col("p0") >= 0)
      .groupBy(col(idCol), col("p0"))
      .agg(countDistinct(col("_off")).as("_n_off"))
      .where(col("_n_off") === phrase.size)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_matches"))
  }
}

/** Snapshot reconciliation — the crawl-over-crawl diff every
  * incremental pipeline runs before deciding what to re-process: a
  * FULL OUTER join of two corpus snapshots on the document key,
  * comparing content fingerprints. One equi-join on the key (both
  * sides shuffle once, AQE-skew-splittable), fingerprints computed
  * per-row; no state, no windows.
  */
object SnapshotDiff {

  /** (idCol, status) per document across the union of both snapshots:
    * `added` (v2 only), `removed` (v1 only), `changed` (both, different
    * fingerprint), `same`. Fingerprint column must be non-null on
    * present rows.
    */
  def diff(v1: DataFrame, v2: DataFrame, idCol: String,
      fpCol: String): DataFrame = {
    val a = v1.select(col(idCol), col(fpCol).as("_fp1"))
    val b = v2.select(col(idCol), col(fpCol).as("_fp2"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_fp1").isNull, "added")
          .when(col("_fp2").isNull, "removed")
          .when(col("_fp1") === col("_fp2"), "same")
          .otherwise("changed").as("status"))
  }

  /** The roll-up consumers alert on: (status, n_docs). */
  def diffSummary(v1: DataFrame, v2: DataFrame, idCol: String,
      fpCol: String): DataFrame =
    diff(v1, v2, idCol, fpCol)
      .groupBy("status").agg(count(lit(1)).as("n_docs"))
}
