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
  * Scale design: one posexplode (no shuffle); first occurrence per
  * paragraph hash is a COMBINABLE `min(struct(doc_id, pos))` aggregation
  * — map-side partials collapse a boilerplate paragraph repeated across
  * millions of pages into one row per task BEFORE the shuffle, which is
  * exactly the distribution this operator exists to catch. (A
  * `row_number` window over the hash would put that whole hot group into
  * a single window partition — no partial aggregation exists for
  * row_number.) The survivor set then joins back on the UNIQUE
  * (doc_id, pos) key — no skew is possible on a unique key — and one
  * per-document aggregation rebuilds the text. First-occurrence choice
  * is the global (doc_id, pos) minimum — deterministic across
  * partitionings and engines, identical to ordering by (doc_id, pos)
  * since struct comparison is lexicographic over its fields. The dedup
  * key is md5 (128-bit): corpus-scale paragraph counts make 32-bit keys
  * collision-prone, and a collision here would DELETE innocent text.
  */
object Paragraphs {

  /** Per-document paragraph dedup over `paras` (an array<string> column).
    * Output: (id, n_paras, n_kept, clean_text) where clean_text joins the
    * surviving paragraphs with `delim` in original order. Documents with
    * zero paragraphs survive with n_paras = 0 and empty text.
    */
  def dedupParagraphs(docs: DataFrame, idCol: String, paras: Column,
      delim: String = "\n"): DataFrame = {
    // posexplode_outer keeps zero-paragraph documents alive as a single
    // null-para row (counted by nothing, never "kept")
    val exploded = docs
      .select(col(idCol), posexplode_outer(paras).as(Seq("pos", "para")))
    // hot-key-safe first occurrence: min(struct) has map-side partials,
    // so a paragraph in 10^8 documents reduces to one row per map task
    // before the exchange on ph
    val firstOcc = exploded
      .where(col("para").isNotNull)
      .groupBy(md5(col("para")).as("ph"))
      .agg(min(struct(col(idCol).as("_fid"), col("pos").as("_fpos")))
        .as("f"))
      .select(col("f._fid").as("_fid"), col("f._fpos").as("_fpos"))
    // join-back on the UNIQUE (doc_id, pos) key — one match per survivor,
    // no hot key regardless of how skewed the paragraph distribution is
    val marked = exploded.join(
      firstOcc.withColumn("_keep", lit(1)),
      col(idCol) === col("_fid") && col("pos") === col("_fpos"), "left")
    val keptStruct = when(col("_keep") === 1, struct(col("pos"), col("para")))
    marked.groupBy(col(idCol))
      .agg(
        count(col("para")).as("n_paras"),
        sum(when(col("_keep") === 1, 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips nulls; array_sort restores document order
        // (pos is unique within a doc, so the struct sort is total)
        array_sort(collect_list(keptStruct)).as("kp"))
      .select(col(idCol), col("n_paras"), col("n_kept"),
        concat_ws(delim,
          transform(col("kp"), s => s.getField("para"))).as("clean_text"))
  }
}
