package graft.ext

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style blocklist gating (Raffel et al. 2020, §2.2 "bad words"
  * filter): a document containing ANY term from a blocklist lexicon is
  * dropped from the training corpus. The standard last-mile curation
  * stage every production pipeline (C4, Gopher, RefinedWeb) runs.
  *
  * Scale design: the lexicon compiles into ONE whole-word alternation
  * regex evaluated per row — the gate rides the same scan as every
  * other per-document signal, zero shuffle at any corpus size, and the
  * single `regexp_extract_all` pass is staged as an aliased projection
  * so hit count / distinct-term count / verdict all derive from one
  * regex evaluation (the regex scan IS the whole per-row cost). For a
  * lexicon beyond a few thousand terms the alternation NFA degrades;
  * the relational form (explode tokens, inner broadcast join against
  * the term table, per-doc count agg — O(1) hash probe per token) is
  * the switch-over, same shape as [[Contamination]]'s decontamination
  * join. The committed `tools/blocklist.txt` terms are restricted to
  * `[a-z0-9]+` so the compiled pattern means the same thing in Java
  * regex and RE2 — the cross-engine regex rule every shared oracle in
  * this repo follows.
  */
object Toxicity {

  /** Load a lexicon file: one lowercase term per line, '#' comments and
    * blank lines ignored; deduplicated and sorted so the compiled
    * pattern is deterministic for any file ordering.
    */
  def loadBlocklist(path: Path): Seq[String] =
    Files.readAllLines(path).asScala.toSeq
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map(_.toLowerCase)
      .distinct.sorted

  /** The committed fixture lexicon (repo-anchored). */
  lazy val DefaultTerms: Seq[String] = loadBlocklist(
    new java.io.File(graft.wat.WatFixture.repoRoot, "tools/blocklist.txt")
      .toPath)

  /** Whole-word alternation pattern over the lexicon. Terms are
    * restricted to [a-z0-9]+: with no regex metacharacters the
    * alternation parses identically in Java regex and RE2, and the \b
    * anchors make the match leftmost-agnostic (a term that prefixes
    * another can never half-match a word), so both engines agree.
    */
  def compile(terms: Seq[String]): String = {
    require(terms.nonEmpty, "blocklist lexicon is empty")
    terms.foreach(t => require(t.matches("[a-z0-9]+"),
      s"blocklist term '$t' must match [a-z0-9]+ — metacharacters would " +
        "desynchronize the Java/RE2 pattern the DuckDB oracle shares"))
    "\\b(" + terms.distinct.sorted.mkString("|") + ")\\b"
  }

  /** All blocklist matches in `text` (case-insensitive, whole-word), as
    * the array of matched terms. Null text propagates null.
    */
  def matches(text: Column, terms: Seq[String]): Column =
    regexp_extract_all(lower(text), lit(compile(terms)), lit(1))

  /** Per-document gate frame: every column of `docs` except `textCol`,
    * plus `n_hits` (total blocklist occurrences), `n_terms` (distinct
    * blocklist terms present), and the C4 verdict `toxic` (any hit).
    * The match array is computed ONCE (staged aliased projection) and
    * all three outputs derive from it.
    */
  def gate(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    val keep = docs.columns.filterNot(_ == textCol).toSeq.map(col)
    docs
      .select(keep :+ matches(col(textCol), terms).as("_m"): _*)
      .select(keep ++ Seq(
        size(col("_m")).cast("long").as("n_hits"),
        size(array_distinct(col("_m"))).cast("long").as("n_terms"),
        (size(col("_m")) > 0).as("toxic")): _*)
  }

  /** The big-lexicon form of [[gate]]: beyond a few thousand terms the
    * alternation NFA degrades, so this path explodes whitespace tokens
    * and inner-joins the BROADCAST term table — an O(1) hash probe per
    * token regardless of lexicon size (the [[Contamination]] join
    * shape), then aggregates per document and left-joins the verdicts
    * back onto the corpus. The hit side is tiny (only flagged tokens
    * survive the inner join), so the join-back broadcasts under AQE;
    * nothing corpus-sized shuffles on a content key.
    *
    * Semantics: exact whole-token match on whitespace tokenization.
    * The regex form additionally matches terms adjacent to punctuation
    * (`\b` boundaries); on whitespace-clean text the two agree —
    * ToxicitySpec pins the equivalence on the fixture corpus. Null
    * text yields null counts/verdict, matching [[gate]].
    */
  def gateRelational(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist lexicon is empty")
    val keep = docs.columns.filterNot(_ == textCol).toSeq.map(col)
    val spark = docs.sparkSession
    import spark.implicits._
    val termDf = terms.distinct.sorted.toDF("_term")
    val hits = docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), " ")).as("_tok"))
      .join(broadcast(termDf), col("_tok") === col("_term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_h"), countDistinct(col("_tok")).as("_t"))
    docs
      .select(keep :+ col(textCol).isNotNull.as("_ht"): _*)
      .join(hits, Seq(idCol), "left")
      .select(keep ++ Seq(
        when(col("_ht"), coalesce(col("_h"), lit(0L))).as("n_hits"),
        when(col("_ht"), coalesce(col("_t"), lit(0L))).as("n_terms"),
        when(col("_ht"), coalesce(col("_h"), lit(0L)) > 0).as("toxic")): _*)
  }

  /** Per-source rollup over a [[gate]] frame: document count, flagged
    * count, total hits, and the flagged rate in exact integer milli
    * (cross-engine bit-identical — no float division). One combinable
    * aggregation; a null verdict (null text) counts as not-flagged on
    * both engines (CASE/otherwise 0).
    */
  def sourceRollup(gated: DataFrame, sourceCol: String): DataFrame =
    gated.groupBy(sourceCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("toxic"), 1L).otherwise(0L)).as("n_toxic"),
        coalesce(sum(col("n_hits")), lit(0L)).as("n_hits"))
      .withColumn("toxic_milli", expr("n_toxic * 1000 div n_docs"))
}
