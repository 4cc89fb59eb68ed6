package graft.wat

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model.DocLink
import graft.ops.UrlOps

/** Single-file, no-Spark extraction — the reference's second public API
  * entry (`process_wat`, cc2dataset/__init__.py:3, main.py:186-206): a
  * plain iterator usable without a cluster. Semantics identical to
  * [[WatExtract]]'s relational path (property-tested against it).
  */
object ProcessWat {

  private val mapper = new ObjectMapper()

  // single source of truth shared with the relational path
  private val audioExts = graft.ops.LinkOps.AudioExts
  private val videoExts = graft.ops.LinkOps.VideoExts
  private val textExts = graft.ops.LinkOps.TextExts.toSet

  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def textOf(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filter(_.isTextual).map(_.asText)

  /** Per-link predicate + alt selection, dispatching on document type
    * (cc2dataset/main.py:117-131). Returns Some(alt) when the link is
    * kept.
    */
  private[wat] def linkAlt(docType: String, link: JsonNode): Option[String] = {
    val url = textOf(link, "url").getOrElse(return None)
    val path = textOf(link, "path")
    val alt = textOf(link, "alt").getOrElse("")
    val text = textOf(link, "text").getOrElse("")
    docType match {
      case "image"      => if (path.contains("IMG@/src") && alt.nonEmpty) Some(alt) else None
      case "image_only" => if (path.contains("IMG@/src")) Some(alt) else None
      // NB: `contains` here is Option.contains — equality with the
      // reference's `link["path"] == "IMG@/src"` (main.py:82,94).
      case "audio"      => if (audioExts.exists(url.endsWith)) Some(text) else None
      case "video"      => if (videoExts.exists(url.endsWith)) Some(text) else None
      case "text" =>
        val parts = url.split("\\.", -1)
        if (parts.length >= 2 && textExts.contains(parts.last)) Some(text) else None
      case other =>
        throw new IllegalArgumentException(s"unknown document_type: $other")
    }
  }

  /** Extract DocLinks from one metadata-record JSON payload. */
  def extractRecord(payload: String, docType: String): Iterator[DocLink] = {
    val root =
      try mapper.readTree(payload)
      catch { case _: Exception => return Iterator.empty } // main.py:139-142
    if (root == null) return Iterator.empty

    val ccFilename = Option(root.at("/Container/Filename"))
      .filter(_.isTextual).map(_.asText).orNull
    val pageUrl = Option(root.at("/Envelope/WARC-Header-Metadata/WARC-Target-URI"))
      .filter(_.isTextual).map(_.asText).orNull
    val html = root.at(
      "/Envelope/Payload-Metadata/HTTP-Response-Metadata/HTML-Metadata")
    val links = html.get("Links")
    if (links == null || !links.isArray) return Iterator.empty

    val headBase = Option(html.at("/Head/Base")).filter(_.isTextual).map(_.asText)
    val base = headBase match {
      case Some(b) if pageUrl != null => UrlOps.resolveUrl(pageUrl, b)
      case Some(b) => b
      case None => pageUrl
    }

    import scala.jdk.CollectionConverters._
    links.elements().asScala.flatMap { l =>
      linkAlt(docType, l).flatMap { alt =>
        val raw = l.get("url").asText
        val abs = if (base == null) raw else UrlOps.resolveUrl(base, raw)
        if (abs != null &&
            (abs.startsWith("http://") || abs.startsWith("https://")))
          Some(DocLink(md5Hex(alt + abs), abs, alt, ccFilename, pageUrl))
        else None
      }
    }
  }

  /** The reference's `process_wat(path, document_type)`: fetch (with
    * retry), frame-split, extract — one iterator, no Spark.
    */
  def apply(path: String, docType: String): Iterator[DocLink] =
    WatReader.metadataPayloads(path).flatMap(extractRecord(_, docType))
}
