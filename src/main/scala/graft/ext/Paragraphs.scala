package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level exact deduplication — the C4 / Lee et al.
  * line-dedup step: a paragraph that appears anywhere earlier in the
  * corpus (by (doc_id, position) order) is removed from every later
  * document, and each document is reassembled from its surviving
  * paragraphs. Catches the boilerplate that document-level dedup can't:
  * navigation blocks, cookie banners, licence footers repeated across
  * millions of otherwise-distinct pages.
  *
  * Scale design: one posexplode (no shuffle), one window over the
  * paragraph's md5 (hash shuffle on a 32-char key — the only place the
  * paragraph text travels), one per-document aggregation to rebuild the
  * text. First-occurrence choice is the global (doc_id, pos) minimum —
  * deterministic across partitionings and engines. The dedup key is
  * md5 (128-bit): corpus-scale paragraph counts make 32-bit keys
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
      .withColumn("ph", md5(col("para")))
    val w = Window.partitionBy("ph").orderBy(col(idCol), col("pos"))
    val flagged = exploded.withColumn("rn", row_number().over(w))
    val keptStruct = when(col("rn") === 1 && col("para").isNotNull,
      struct(col("pos"), col("para")))
    flagged.groupBy(col(idCol))
      .agg(
        count(col("para")).as("n_paras"),
        sum(when(col("rn") === 1 && col("para").isNotNull, 1L)
          .otherwise(0L)).as("n_kept"),
        // collect_list skips nulls; array_sort restores document order
        // (pos is unique within a doc, so the struct sort is total)
        array_sort(collect_list(keptStruct)).as("kp"))
      .select(col(idCol), col("n_paras"), col("n_kept"),
        concat_ws(delim,
          transform(col("kp"), s => s.getField("para"))).as("clean_text"))
  }
}
