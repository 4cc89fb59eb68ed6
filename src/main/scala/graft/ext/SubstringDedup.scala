package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Substring-level exact dedup — the Lee et al. "Deduplicating Training
  * Data Makes Language Models Better" (arXiv:2107.06499) ExactSubstr
  * transform, re-expressed relationally. The paper builds a corpus suffix
  * array and removes every substring of >= 50 tokens that occurs twice
  * anywhere in the corpus; a suffix array is inherently a single
  * shared-memory structure, so the Spark-native equivalent works on the
  * fixed-width token n-gram lattice instead: a token position is
  * "duplicated" iff it is covered by some n-gram whose exact text occurs
  * at least `minCount` times corpus-wide. Runs of covered positions merge
  * into maximal spans, and [[removeDuplicatedSpans]] cuts them out of
  * the documents.
  *
  * With gram size n = the paper's threshold k (and minCount = 2) the
  * lattice is EXACT, not an approximation: if a substring S with
  * |S| >= k occurs at positions q1 != q2, every length-k window of S
  * occurs at both q1+o and q2+o, so each of S's positions is covered by
  * a duplicated k-gram; conversely a duplicated k-gram IS a length-k
  * substring occurring twice. SubstringDedupExactSpec verifies the
  * covered-token set, span runs, and cleaned fingerprints against a
  * driver-side pairwise-LCP reference (over-removal 0, under-removal 0
  * on a planted corpus). The one quantization hazard is parameterization:
  * approximating threshold k with a SMALLER gram n < k keeps
  * under-removal at 0 but over-removes (measured 8.7% of the planted
  * corpus at n=10 or 25 vs k=50) — size n to the threshold, never below.
  *
  * Scale design (100 TB): every structure is rows of
  * (doc_id, position, 8-byte gram hash). The corpus-wide occurrence
  * count is one combinable hash aggregation on the gram hash; the
  * join-back is equi on the same key (AQE-skew-splittable when one
  * boilerplate gram floods a bucket — the count side is one row per
  * gram). Span merging uses a window PARTITIONed BY doc_id ordered by
  * position — allowed by DESIGN.md rule 1 because a partition is one
  * document's duplicated-gram starts, structurally bounded by document
  * length, never corpus-scale. Document reconstruction is
  * explode + anti-join + one ordered-collect aggregation per doc.
  */
object SubstringDedup {

  /** Every n-gram occurrence with its 0-based start position:
    * (idCol, pos, g) where g = h32 of the space-joined gram text.
    * NOT distinct per doc — within-document repetition counts toward
    * the corpus occurrence count, exactly like a suffix array sees it.
    *
    * Shape notes (shared with Contamination.hashedGramRows, measured
    * there): null ids filtered at the source so the twin consumers
    * (count agg + join-back) stay canonical and share one exchange;
    * the hash runs AFTER the explode in a plain Project (codegen'd,
    * evaluated once — InferFiltersFromGenerate would re-evaluate any
    * expensive work placed inside the generator array).
    */
  def positionedGramRows(docs: DataFrame, idCol: String, words: Column,
      n: Int): DataFrame = {
    require(n >= 1, s"gram size must be >= 1, got $n")
    docs
      .where(col(idCol).isNotNull)
      .select(col(idCol), words.as("_tk"))
      .select(col(idCol),
        posexplode(Contamination.ngrams(col("_tk"), n)))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        Hashing.h32(col("col")).as("g"))
  }

  /** Start positions whose n-gram occurs >= minCount times corpus-wide. */
  def duplicatedStarts(docs: DataFrame, idCol: String, words: Column,
      n: Int, minCount: Int): DataFrame = {
    val grams = positionedGramRows(docs, idCol, words, n)
    val dupGrams = grams.groupBy("g")
      .agg(count(lit(1)).as("occ"))
      .where(col("occ") >= minCount)
    grams.join(dupGrams.select("g"), "g").select(col(idCol), col("pos"))
  }

  /** Maximal duplicated spans per document, gram starts merged by
    * gaps-and-islands: a start at p covers tokens [p, p+n-1]; two starts
    * p1 < p2 fall in one span iff p2 <= p1 + n (overlapping or exactly
    * adjacent coverage). Output one row per maximal span:
    * (idCol, span_start, span_end, n_starts) — token positions 0-based
    * inclusive.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, words: Column,
      n: Int = 5, minCount: Int = 2): DataFrame = {
    val starts = duplicatedStarts(docs, idCol, words, n, minCount)
    // Doc-bounded window (DESIGN.md rule 1): one document's dup starts.
    val w = Window.partitionBy(idCol).orderBy("pos")
    val newSpan = when(col("pos") <= lag("pos", 1).over(w) + n, lit(0L))
      .otherwise(lit(1L)) // lag null (first row) compares to null -> otherwise
    starts
      .withColumn("_nf", newSpan)
      .withColumn("_island", sum("_nf").over(
        Window.partitionBy(idCol).orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_island"))
      .agg(min("pos").as("span_start"),
        (max("pos") + (n - 1)).as("span_end"),
        count(lit(1)).as("n_starts"))
      .drop("_island")
  }

  /** The dedup transform itself: documents with every duplicated span's
    * tokens removed. Output one row per input document (null-id docs
    * excluded, as everywhere in the gram stack):
    * (idCol, n_tokens, n_removed, clean_fp) where clean_fp = md5 of the
    * space-rejoined surviving tokens (kept instead of the full text so
    * the result stays narrow at corpus scale; equality of fingerprints
    * is equality of cleaned documents).
    *
    * Plan: dup starts -> explode covered offsets (linear in duplicated
    * tokens) -> distinct -> anti-join against the posexploded token
    * stream -> per-doc ordered collect. The collect_list partition is
    * one document (bounded); array_sort on (idx, token) structs makes
    * the collect order-insensitive.
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, words: Column,
      n: Int = 5, minCount: Int = 2): DataFrame = {
    val starts = duplicatedStarts(docs, idCol, words, n, minCount)
    val covered = starts
      .select(col(idCol), explode(sequence(col("pos"),
        col("pos") + (n - 1))).as("idx"))
      .distinct()
    val toks = docs
      .where(col(idCol).isNotNull)
      .select(col(idCol), posexplode(words))
      .select(col(idCol), col("pos").cast("long").as("idx"),
        col("col").as("token"))
    val kept = toks.join(covered, Seq(idCol, "idx"), "left_anti")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("idx"), col("token")))),
            x => x.getField("token")))).as("clean_fp"))
    docs
      .where(col(idCol).isNotNull)
      .select(col(idCol), size(words).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_fp"),
          lit(org.apache.commons.codec.digest.DigestUtils.md5Hex("")))
          .as("clean_fp"))
  }
}
