package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML boilerplate stripping as a relational stage — the
  * Arc90-readability / Boilerpipe (Kohlschütter et al., WSDM 2010)
  * text-density heuristic reduced to its load-bearing core: segment the
  * page into block-level fragments, score each block by visible-text
  * length and LINK DENSITY (anchor-text chars / visible chars), keep
  * the low-density content blocks, reassemble the main text. Navigation
  * chrome, ad units, and footers are overwhelmingly anchor text; body
  * copy is not — that one signal carries most of Boilerpipe's measured
  * accuracy and it is computable with portable regex + integer
  * arithmetic, so the whole stage is oracle-checkable cross-engine.
  *
  * Scale design: one `posexplode` of the block split, then pure per-row
  * codegen'd projections (tag strip, anchor-text extraction, integer
  * density test), then ONE per-document aggregation whose groups are
  * bounded by block count (DESIGN bounded-partition rule — never
  * corpus-keyed). The reassembled text rides a
  * `collect_list(struct(pos, text))` sorted in-row, so block order
  * survives any partitioning. Regexes use only constructs that parse
  * identically in Java regex and RE2 (the repo's shared-oracle rule).
  */
object Boilerplate {

  /** Default block-closing tags that end a segment. */
  val DefaultBlockTags: Seq[String] =
    Seq("div", "footer", "header", "li", "nav", "p", "section", "ul")

  /** The fragment-split pattern — exposed so the DuckDB oracle compiles
    * the IDENTICAL pattern from the same tag set.
    */
  def splitPattern(tags: Seq[String] = DefaultBlockTags): String = {
    tags.foreach(t => require(t.matches("[a-z0-9]+"),
      s"block tag '$t' must be [a-z0-9]+ (Java/RE2 pattern parity)"))
    "</(?:" + tags.distinct.sorted.mkString("|") + ")>"
  }

  /** Strip tags and collapse whitespace: the block's visible text. */
  val TagPattern = "<[^>]*>"

  /** The block's visible text in ONE tag-pattern scan: `split` on the
    * tag pattern yields the text BETWEEN tags (each tag boundary acts
    * as the space the old `regexp_replace(tag, " ")` inserted), so
    * join-with-space + collapse + trim is byte-identical to
    * replace-then-collapse while scanning the raw HTML once instead of
    * materializing a same-length tags-to-spaces copy and re-scanning
    * it. Measured (BoilerplateProbe, clean JVM, identical result
    * fingerprints): 0.80 → 0.55 s at sf0.1, 3.06 → 2.80 s at sf10.
    */
  private def visibleText(block: Column): Column =
    trim(regexp_replace(
      array_join(split(block, TagPattern), " "), " +", " "))

  /** Anchor text (group 1): the chars that count toward link density. */
  val AnchorPattern = "<a[^>]*>([^<]*)</a>"

  /** Per-ROW form of the strip: the same block rule evaluated entirely
    * with array HOFs — zero shuffle and zero state, so it rides a
    * structured-streaming intake as a stateless transform (no
    * watermark, append mode — [[graft.streaming.StreamOps.curationGateStream]]).
    * The explode+agg form ([[extractMainContent]]) stays the batch
    * default: its per-block regex work runs codegen'd where lambda
    * bodies here run interpreted. Same keep rule, same reassembly;
    * a page with no surviving text yields '' (the batch form emits no
    * row — BoilerplateSpec pins the correspondence).
    */
  def stripColumn(html: Column, minChars: Int = 10,
      maxLinkDensityMilli: Int = 400,
      tags: Seq[String] = DefaultBlockTags): Column = {
    val scored = transform(split(html, splitPattern(tags)), b =>
      struct(
        visibleText(b).as("btext"),
        length(array_join(
          regexp_extract_all(b, lit(AnchorPattern), lit(1)), ""))
          .cast("long").as("lc")))
    val kept = filter(scored, s => {
      val t = s.getField("btext")
      t =!= "" && length(t) >= minChars &&
        s.getField("lc") * 1000 < length(t).cast("long") * maxLinkDensityMilli
    })
    concat_ws(" ", transform(kept, s => s.getField("btext")))
  }

  /** Per-document main-content extraction. Output per doc:
    * `n_blocks` (content-bearing fragments), `n_kept`, `boiler_milli`
    * (boilerplate char share in exact integer milli), `clean_text`
    * (kept blocks rejoined in order). A block survives iff its visible
    * text has at least `minChars` chars AND its link density is below
    * `maxLinkDensityMilli` (exact integer compare:
    * link_chars·1000 < max·text_chars). Documents whose html strips to
    * nothing produce no row (no content-bearing blocks), mirroring the
    * oracle's empty unnest.
    */
  def extractMainContent(docs: DataFrame, idCol: String, htmlCol: String,
      minChars: Int = 10, maxLinkDensityMilli: Int = 400,
      tags: Seq[String] = DefaultBlockTags): DataFrame = {
    val scored = docs
      .select(col(idCol),
        posexplode(split(col(htmlCol), splitPattern(tags)))
          .as(Seq("pos", "blk")))
      .select(col(idCol), col("pos"),
        visibleText(col("blk")).as("btext"),
        length(array_join(
          regexp_extract_all(col("blk"), lit(AnchorPattern), lit(1)), ""))
          .cast("long").as("link_chars"))
      .where(col("btext").isNotNull && col("btext") =!= "")
      .withColumn("tc", length(col("btext")).cast("long"))
      .withColumn("keep",
        col("tc") >= minChars &&
          col("link_chars") * 1000 < col("tc") * maxLinkDensityMilli)
    scored.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("tc")).as("_total"),
        coalesce(sum(when(col("keep"), col("tc"))), lit(0L)).as("_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("pos"), col("btext"))))),
            s => s.getField("btext"))).as("clean_text"))
      .select(col(idCol), col("n_blocks"), col("n_kept"),
        expr("(_total - _kept) * 1000 div _total").as("boiler_milli"),
        col("clean_text"))
  }
}
