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
    */
  def phraseMatches(docs: DataFrame, idCol: String, tokens: Column,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val toks = docs
      .where(col(idCol).isNotNull)
      .select(col(idCol), posexplode(tokens))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("col").as("token"))
    val parts = phrase.zipWithIndex.map { case (w, i) =>
      toks.where(col("token") === w)
        .select(col(idCol), (col("pos") - i).as("p0"))
    }
    parts.reduce((a, b) => a.join(b, Seq(idCol, "p0")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_matches"))
  }
}
