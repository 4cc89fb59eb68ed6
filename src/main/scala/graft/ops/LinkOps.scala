package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Link-level predicates, projections and the uid hash — the relational
  * re-expression of the reference's per-link list comprehensions.
  *
  * Everything here is a pure `Column` expression so it stays inside
  * whole-stage codegen and is visible to Catalyst (constant folding of the
  * extension lists, predicate pushdown when applied right after a scan).
  *
  * Reference points: cc2dataset/main.py:23-101 (predicates/projections),
  * main.py:168-174 (scheme filter + uid).
  */
object LinkOps {

  /** Audio url suffixes (cc2dataset/main.py:70-72). */
  val AudioExts: Seq[String] = Seq(".ogg", ".wav", ".mp3", ".flac", ".m4a")

  /** Video url suffixes (cc2dataset/main.py:23-27). */
  val VideoExts: Seq[String] =
    Seq(".avi", ".mp4", ".mkv", ".webm", ".mov", ".mpg", ".mpeg", ".m4v")

  /** Text-document extensions, matched against the LAST dot-split segment —
    * NOT endswith: `a.pdf?x=1` is rejected (cc2dataset/main.py:35-62).
    */
  val TextExts: Seq[String] = Seq(
    "pdf", "epub", "djvu", "mobi", "doc", "docx", "rtf", "txt", "odt",
    "ppt", "pptx", "pages", "keynote", "wps", "md")

  /** F1: image with non-empty alt (cc2dataset/main.py:81-84). */
  def validImageLink(path: Column, alt: Column): Column =
    path === "IMG@/src" && length(coalesce(alt, lit(""))) > 0

  /** F2: any image tag (cc2dataset/main.py:93-95). */
  def validImageOnlyLink(path: Column): Column = path === "IMG@/src"

  /** Disjunction of suffix matches; folds to a codegen'd or-chain. */
  def endsWithAny(url: Column, exts: Seq[String]): Column =
    exts.map(e => url.endsWith(e)).reduce(_ || _)

  /** F3 (cc2dataset/main.py:70-72). */
  def validAudioLink(url: Column): Column = endsWithAny(url, AudioExts)

  /** F4 (cc2dataset/main.py:23-27). */
  def validVideoLink(url: Column): Column = endsWithAny(url, VideoExts)

  /** F5: split-on-dot text predicate (cc2dataset/main.py:56-62).
    * `size >= 2` mirrors the reference's guard; `element_at(-1)` is the
    * last segment.
    */
  def validTextLink(url: Column): Column = {
    val parts = split(url, "\\.")
    size(parts) >= 2 && element_at(parts, -1).isin(TextExts: _*)
  }

  /** F6: scheme filter, applied AFTER absolutization
    * (cc2dataset/main.py:168-172).
    */
  def hasHttpScheme(url: Column): Column =
    url.startsWith("http://") || url.startsWith("https://")

  /** X4: uid = md5(alt + url), concat order alt-then-url, UTF-8
    * (cc2dataset/main.py:174). Builtin `md5(concat(...))` gives exact
    * parity with Python's hashlib on UTF-8 input.
    */
  def uid(alt: Column, url: Column): Column = md5(concat(alt, url))

  /** F8: (filter, altExpr) pair per document type
    * (cc2dataset/main.py:117-131). `alt` defaults to "" for every type but
    * `image`/`image_only` use the link's `alt` attr, others use `text`
    * (P1/P2, cc2dataset/main.py:30-101).
    *
    * @param link a struct column with fields url/text/alt/path
    */
  def forDocumentType(docType: String, link: Column): (Column, Column) = {
    val alt = coalesce(link("alt"), lit(""))
    val text = coalesce(link("text"), lit(""))
    docType match {
      case "image"      => (validImageLink(link("path"), link("alt")), alt)
      case "image_only" => (validImageOnlyLink(link("path")), alt)
      case "audio"      => (validAudioLink(link("url")), text)
      case "text"       => (validTextLink(link("url")), text)
      case "video"      => (validVideoLink(link("url")), text)
      case other =>
        throw new IllegalArgumentException(s"unknown document_type: $other")
    }
  }
}
