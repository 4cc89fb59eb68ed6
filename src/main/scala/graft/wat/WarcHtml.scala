package graft.wat

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.DocLink

/** Raw-WARC HTML link extraction — the fallback source when a crawl's
  * WAT sidecars are missing or stale.
  *
  * The reference only ever reads WAT's PRE-EXTRACTED `Links` array
  * (cc2dataset/main.py:144-155); real pipelines also need the raw-WARC
  * path: scan `response` records, strip the HTTP header block, and
  * recover the same {path, url, alt, text} link rows from the HTML
  * itself (IMG src/alt, A href/anchor-text, head `<base href>`). The
  * output feeds the SAME relational tail as WAT extraction
  * ([[WatExtract.extractLinks]]: type predicate → absolutize → scheme
  * filter → uid), so the two sources are interchangeable downstream —
  * and provably so: the q_warc_extract oracle hash-matches WARC-HTML
  * extraction against the committed WAT extraction of the same
  * synthetic pages.
  *
  * The scanner is a single-pass imperative tag walk (the per-record
  * imperative hop, same layer as the WARC frame split), not a DOM: at
  * crawl scale the HTML is hostile and huge, so it never allocates
  * from document-controlled counts, skips script/style/comment spans,
  * and fails closed per record.
  */
object WarcHtml {

  /** One extracted link in WAT's own vocabulary: `path` is the WAT
    * path token ("IMG@/src" / "A@/href"); absent alt/text are null,
    * exactly as PERMISSIVE from_json renders WAT's omitted keys.
    */
  final case class Link(url: String, text: String, alt: String, path: String)

  /** One page's link frame row — matches [[WatExtract.extractLinks]]'s
    * expected columns.
    */
  final case class PageLinks(cc_filename: String, page_url: String,
      head_base: String, links: Seq[Link])

  // ------------------------------------------------------------------
  // HTML scanning (pure, per record)
  // ------------------------------------------------------------------

  private val Entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&amp;" -> "&") // &amp; LAST: double-unescape is wrong

  private def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    var out = s
    for ((e, c) <- Entities) out = out.replace(e, c)
    out
  }

  /** Case-insensitive indexOf. */
  private def ciIndexOf(s: String, target: String, from: Int): Int = {
    var i = math.max(0, from)
    val lim = s.length - target.length
    while (i <= lim) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** Parse the tag starting at `lt` ('<'): (lowercased name or "" for
    * closing/declaration/malformed tags, attrs, index just past '>').
    * Attribute values respect single/double quotes; unquoted values end
    * at whitespace or '>'.
    */
  private def parseTag(html: String, lt: Int): (String, Map[String, String], Int) = {
    val n = html.length
    var i = lt + 1
    if (i < n && (html.charAt(i) == '/' || html.charAt(i) == '!' ||
      html.charAt(i) == '?')) {
      // closing tag / declaration / PI: skip to '>'
      val gt = html.indexOf('>', i)
      return ("", Map.empty, if (gt < 0) n else gt + 1)
    }
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit)) i += 1
    if (i == nameStart) return ("", Map.empty, lt + 1) // stray '<'
    val name = html.substring(nameStart, i).toLowerCase
    var attrs = Map.empty[String, String]
    var done = false
    while (!done && i < n) {
      val c = html.charAt(i)
      if (c == '>') { i += 1; done = true }
      else if (c.isWhitespace || c == '/') i += 1
      else {
        // attribute name
        val as = i
        while (i < n && !html.charAt(i).isWhitespace &&
          html.charAt(i) != '=' && html.charAt(i) != '>' &&
          html.charAt(i) != '/') i += 1
        val aname = html.substring(as, i).toLowerCase
        while (i < n && html.charAt(i).isWhitespace) i += 1
        if (i < n && html.charAt(i) == '=') {
          i += 1
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i)
            val vs = i + 1
            val ve = html.indexOf(q, vs)
            if (ve < 0) { // unterminated quote: malformed, stop the tag
              return (name, attrs, n)
            }
            if (aname.nonEmpty && !attrs.contains(aname))
              attrs += aname -> unescape(html.substring(vs, ve))
            i = ve + 1
          } else {
            val vs = i
            while (i < n && !html.charAt(i).isWhitespace &&
              html.charAt(i) != '>') i += 1
            if (aname.nonEmpty && !attrs.contains(aname))
              attrs += aname -> unescape(html.substring(vs, i))
          }
        } else if (aname.nonEmpty && !attrs.contains(aname)) {
          attrs += aname -> "" // bare attribute
        }
      }
    }
    (name, attrs, i)
  }

  /** Inner HTML → visible anchor text: tags stripped, entities
    * unescaped, whitespace collapsed, trimmed.
    */
  private def anchorText(inner: String): String = {
    val sb = new StringBuilder(inner.length min 4096)
    var i = 0
    var inTag = false
    while (i < inner.length && sb.length < 4096) {
      val c = inner.charAt(i)
      if (c == '<') inTag = true
      else if (c == '>') inTag = false
      else if (!inTag) sb.append(c)
      i += 1
    }
    unescape(sb.toString).split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  /** Scan one HTML document: (head base href if any, links in document
    * order). Script/style/comment spans are skipped; anchors capture
    * their visible text but the scan RE-ENTERS the anchor body (an img
    * nested in a link must still be found). Never throws on hostile
    * input — any scan failure yields what was collected so far.
    */
  def scanHtml(html: String): (Option[String], Vector[Link]) = {
    val out = Vector.newBuilder[Link]
    var headBase: Option[String] = None
    try {
      val n = html.length
      var i = 0
      while (i < n) {
        val lt = html.indexOf('<', i)
        if (lt < 0) i = n
        else if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else {
          val (name, attrs, tagEnd) = parseTag(html, lt)
          name match {
            case "" => i = tagEnd
            case "base" =>
              if (headBase.isEmpty)
                headBase = attrs.get("href").filter(_.nonEmpty)
              i = tagEnd
            case "img" =>
              attrs.get("src").filter(_.nonEmpty).foreach { src =>
                out += Link(src, null,
                  attrs.get("alt").filter(_.nonEmpty).orNull, "IMG@/src")
              }
              i = tagEnd
            case "a" =>
              attrs.get("href").filter(_.nonEmpty).foreach { href =>
                val close = ciIndexOf(html, "</a", tagEnd)
                val text =
                  if (close < 0) ""
                  else anchorText(html.substring(tagEnd, close))
                out += Link(href, if (text.isEmpty) null else text,
                  null, "A@/href")
              }
              i = tagEnd // re-enter the body: nested tags still scan
            case "script" | "style" =>
              val close = ciIndexOf(html, "</" + name, tagEnd)
              i = if (close < 0) n else {
                val gt = html.indexOf('>', close)
                if (gt < 0) n else gt + 1
              }
            case _ => i = tagEnd
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
    (headBase, out.result())
  }

  // ------------------------------------------------------------------
  // WARC response plumbing
  // ------------------------------------------------------------------

  /** Header-only check of an `application/http` response payload:
    * Some(body start offset) iff it has an HTTP status line, a
    * `text/html` Content-Type, and a CRLF CRLF header terminator.
    * Costs no body decode — the column-pruned DSv2 path (html column
    * dropped) pays exactly this per record.
    */
  def htmlBodyStart(payload: Array[Byte]): Option[Int] = {
    if (payload.length < 16) return None
    val head = new String(payload, 0,
      math.min(payload.length, 8192), UTF_8)
    if (!head.startsWith("HTTP/")) return None
    val sep = indexOfCrlfCrlf(payload)
    if (sep < 0) return None
    val headers = new String(payload, 0, sep, UTF_8).toLowerCase
    val ctIdx = headers.indexOf("content-type:")
    if (ctIdx < 0) return None
    val ctEnd = headers.indexOf('\r', ctIdx) match {
      case -1 => headers.length
      case e  => e
    }
    if (!headers.substring(ctIdx, ctEnd).contains("text/html")) return None
    Some(sep + 4)
  }

  /** Split an `application/http` response payload into its HTML body:
    * [[htmlBodyStart]]'s checks, then the decode. None (fail closed)
    * otherwise — non-HTML responses carry no links to extract.
    */
  def htmlOfHttpResponse(payload: Array[Byte]): Option[String] =
    htmlBodyStart(payload).map(s =>
      new String(payload, s, payload.length - s, UTF_8))

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** All HTML pages of one WARC: response records → (target URI, head
    * base, links). Same fault tolerance as the WAT reader: a corrupt
    * frame ends the file, a non-HTML or header-less response is
    * skipped.
    */
  def pagesOf(path: String, conf: Configuration,
      onCorrupt: Exception => Unit): ClosingIterator[PageLinks] = {
    val ccName = path.substring(path.lastIndexOf('/') + 1)
    val source = WatReader.fetchAllBytes(path, conf)
    source match {
      case None =>
        onCorrupt(new java.io.IOException(s"fetch failed after retries: $path"))
        ClosingIterator.empty
      case Some(bytes) =>
        val recs = WatReader.records(
          new java.io.ByteArrayInputStream(bytes), gzipped = true, onCorrupt)
        new ClosingIterator(
          recs.filter(_.warcType.equalsIgnoreCase("response"))
            .flatMap { r =>
              htmlOfHttpResponse(r.payload).map { html =>
                val (base, links) = scanHtml(html)
                PageLinks(ccName,
                  r.headers.getOrElse("warc-target-uri", null),
                  base.orNull, links)
              }
            },
          () => recs.close())
    }
  }
}

/** WARC(raw HTML) → DocLink extraction: the WAT pipeline's structure —
  * one imperative task per archive, then the SHARED relational tail —
  * with [[WarcHtml.scanHtml]] standing where WAT's pre-extracted JSON
  * stood. Interchangeable with [[WatExtract]] downstream by
  * construction (both call [[WatExtract.extractLinks]]).
  */
object WarcExtract {

  /** One partition per WARC path (the reference's parallelization
    * unit carried over: main.py:273-274) → link frame rows.
    */
  def pages(spark: SparkSession, paths: Seq[String]): DataFrame =
    pages(spark, paths,
      spark.sparkContext.longAccumulator("graft.warc.read_errors"))

  def pages(spark: SparkSession, paths: Seq[String],
      readErrors: org.apache.spark.util.LongAccumulator): DataFrame = {
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(
      spark.sparkContext.parallelize(paths, math.max(1, paths.size)))
      .flatMap { p =>
        val it = WarcHtml.pagesOf(p, confBc.value.value,
          _ => readErrors.add(1L))
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => it.close()))
        it
      }
      .toDF()
  }

  /** End-to-end: WARC paths → DocLink dataset, same semantics (and
    * same relational tail) as [[WatExtract.fromPaths]].
    */
  def fromPaths(spark: SparkSession, paths: Seq[String],
      docType: String): Dataset[DocLink] =
    WatExtract.extractLinks(pages(spark, paths), docType)

  /** Same, through the DataSourceV2 `warc` source — planning-time
    * partition pruning on `warc_path` predicates and `max_tasks`
    * batching come for free; the HTML scan runs per row in the same
    * task that decoded the archive (no re-shuffle of page bodies).
    */
  def fromDsv2(spark: SparkSession, paths: Seq[String], docType: String,
      maxTasks: Int = graft.sources.WatDataSource.DefaultMaxTasks)
      : Dataset[DocLink] = {
    import spark.implicits._
    val linkFrame = spark.read.format("warc")
      .option("max_tasks", maxTasks.toString)
      .load(paths: _*)
      .select("warc_path", "page_url", "html")
      .as[(String, String, String)]
      .mapPartitions(_.map { case (p, uri, html) =>
        val (base, links) = WarcHtml.scanHtml(html)
        WarcHtml.PageLinks(p.substring(p.lastIndexOf('/') + 1), uri,
          base.orNull, links)
      })
      .toDF()
    WatExtract.extractLinks(linkFrame, docType)
  }
}
