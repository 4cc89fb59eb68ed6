package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level exact deduplication — the C4 / Lee et al.
  * line-dedup step: a paragraph that appears anywhere earlier in the
  * corpus (by (doc_id, position) order) is removed from every later
  * document, and each document is reassembled from its surviving
  * paragraphs. Catches the boilerplate that document-level dedup can't:
  * navigation blocks, cookie banners, licence footers repeated across
  * millions of otherwise-distinct pages.
  *
  * Scale design — the corpus is exploded and aggregated ONCE:
  *
  *  - First occurrence per paragraph hash is a COMBINABLE
  *    `min(struct(doc_id, pos, para))` aggregation: map-side partials
  *    collapse a boilerplate paragraph repeated across millions of
  *    pages into one row per task BEFORE the exchange on the hash —
  *    exactly the distribution this operator exists to catch. (A
  *    `row_number` window over the hash would put that whole hot group
  *    into a single window partition — no partial aggregation exists
  *    for row_number.) The min is decided by (doc_id, pos) alone —
  *    struct comparison is lexicographic and (doc_id, pos) is unique,
  *    so the trailing text field never arbitrates; it simply RIDES the
  *    aggregation so survivors rebuild without a join back to the
  *    exploded corpus (a join-back would compute the upstream twice —
  *    measured 2x on gated compositions — and re-shuffle the corpus).
  *  - Documents then rebuild from the SURVIVOR rows only (one
  *    aggregation keyed by doc id), and per-document paragraph counts
  *    come from the input array lengths — no second explode. Documents
  *    whose every paragraph lost (or with zero paragraphs) resurrect
  *    via the left join from `docs`, which is keyed by the unique doc
  *    id — no skew possible.
  *
  * First-occurrence choice is the global (doc_id, pos) minimum —
  * deterministic across partitionings and engines. The dedup key is
  * md5 (128-bit): corpus-scale paragraph counts make 32-bit keys
  * collision-prone, and a collision here would DELETE innocent text.
  */
object Paragraphs {

  /** Per-document paragraph dedup over `paras` (an array<string> column).
    * Output: (id, n_paras, n_kept, clean_text) where clean_text joins the
    * surviving paragraphs with `delim` in original order. Documents with
    * zero paragraphs survive with n_paras = 0 and empty text. Null
    * elements inside `paras` are ignored (never counted, never kept),
    * matching SQL aggregate null semantics.
    */
  def dedupParagraphs(docs: DataFrame, idCol: String, paras: Column,
      delim: String = "\n"): DataFrame = {
    // posexplode_OUTER, deliberately: a plain explode would let
    // InferFiltersFromGenerate copy the entire `paras` expression into
    // a size(..) > 0 filter under the Generate — re-evaluating a
    // possibly-expensive segmentation once more per row. The outer
    // form generates a null row instead, dropped by the cheap
    // attribute filter inside dedupParagraphRows.
    val parRows = docs
      .select(col(idCol), posexplode_outer(paras).as(Seq("pos", "para")))
    val counts = docs.select(col(idCol),
      coalesce(size(filter(paras, p => p.isNotNull)), lit(0))
        .cast("long").as("n_paras"))
    dedupParagraphRows(parRows, counts, idCol, delim)
  }

  /** Row-level entry — for callers whose segmentation is itself
    * relational (e.g. content-defined chunks built from exploded
    * tokens), so the paragraph text is produced exactly once.
    * `parRows` = (idCol, pos, para) with pos unique per document (null
    * paras ignored); `docCounts` = (idCol, n_paras) and must cover
    * EVERY document — zero-paragraph documents resurrect from it.
    */
  def dedupParagraphRows(parRows: DataFrame, docCounts: DataFrame,
      idCol: String, delim: String = "\n"): DataFrame = {
    // survivors: one combinable aggregation over the paragraph rows —
    // the ONLY pass that touches paragraph text
    val survivors = parRows
      .where(col("para").isNotNull)
      .groupBy(md5(col("para")).as("ph"))
      .agg(min(struct(col(idCol).as("_fid"), col("pos").as("_fpos"),
        col("para").as("_fpara"))).as("f"))
      .select(col("f._fid").as(idCol), col("f._fpos").as("pos"),
        col("f._fpara").as("para"))
    val rebuilt = survivors.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        // array_sort restores document order (pos is unique in a doc)
        array_sort(collect_list(struct(col("pos"), col("para"))))
          .as("kp"))
      .select(col(idCol), col("n_kept"),
        concat_ws(delim,
          transform(col("kp"), s => s.getField("para"))).as("clean_text"))
    docCounts
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
