package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}

/** HTML → Markdown structured-text extraction — the modern
  * training-corpus text shape (headings, lists, code fences, links
  * preserved as structure instead of flattened away), one step past
  * [[Boilerplate]]'s plain-text strip. Single-pass tag walk in the
  * same spirit as `wat.WarcHtml.scanHtml` (script/style/comment
  * traps, entity decoding, attribute parsing), composing with the
  * raw-WARC source: warc scan → htmlToMarkdown → markdown corpus.
  *
  * Rendering convention (deterministic, SQL-oracle-checkable):
  *  - h1..h6 → `#`-prefixed blocks; p/div close blocks
  *  - ul/ol li → `- ` / `n. ` lines; items of ONE list join with
  *    single newlines, distinct lists are distinct blocks
  *  - pre → fenced ``` block, inner <code> wrapper stripped, content
  *    entity-decoded but NOT whitespace-collapsed
  *  - blockquote → `> ` prefix
  *  - a → `[text](href)`, img → `![alt](src)`, b/strong → `**`,
  *    i/em → `*`, inline code → backticks (inner text trimmed)
  *  - table → pipe table (first row is the header, `---` separator,
  *    short rows padded to the widest)
  *  - text whitespace collapses to single spaces (HTML rendering
  *    semantics); `<br>` is a hard line break within its block
  *  - head/script/style/title/noscript content contributes nothing;
  *    comments and declarations are skipped
  *  - blocks join with blank lines
  *
  * Hostile input never throws: unclosed tags degrade to plain text,
  * mismatched closes pop to the nearest match, scans are cursor-
  * monotonic and bounded by the input length.
  */
object HtmlMarkdown {

  private def unescape(s: String): String =
    HtmlEntities.unescape(s, HtmlEntities.WithNbsp)

  private def ciIndexOf(s: String, target: String, from: Int): Int = {
    var i = math.max(0, from)
    val lim = s.length - target.length
    while (i <= lim) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** Hard-break sentinel `<br>` plants before whitespace collapse. */
  private final val Br = "\u0001"

  /** HTML rendering whitespace: every run collapses to one space,
    * except runs holding a [[Br]] sentinel, which become one '\n'.
    */
  private def collapse(s: String): String = {
    val parts = s.split(Br, -1)
    parts.iterator
      .map(_.replaceAll("[\\s]+", " ").trim)
      .mkString("\n")
      // a break at a block edge or doubled breaks leave empty lines;
      // markdown hard breaks inside one block keep single newlines
      .replaceAll("\n+", "\n").trim
  }

  /** Tag at `lt`: (name lowercased — "/name" for closing tags, "" for
    * declarations/stray '<' —, attrs, index past '>').
    */
  private def parseTag(html: String, lt: Int)
      : (String, Map[String, String], Int) = {
    val n = html.length
    var i = lt + 1
    var closing = false
    if (i < n && html.charAt(i) == '/') { closing = true; i += 1 }
    else if (i < n && (html.charAt(i) == '!' || html.charAt(i) == '?')) {
      val gt = html.indexOf('>', i)
      return ("", Map.empty, if (gt < 0) n else gt + 1)
    }
    val nameStart = i
    while (i < n && html.charAt(i).isLetterOrDigit) i += 1
    if (i == nameStart) return ("", Map.empty, lt + 1) // stray '<'
    val name = html.substring(nameStart, i)
      .toLowerCase(java.util.Locale.ROOT) // Locale.ROOT: tr-locale safe
    var attrs = Map.empty[String, String]
    var done = false
    while (!done && i < n) {
      val c = html.charAt(i)
      if (c == '>') { i += 1; done = true }
      else if (c.isWhitespace || c == '/') i += 1
      else {
        val as = i
        while (i < n && !html.charAt(i).isWhitespace &&
            html.charAt(i) != '=' && html.charAt(i) != '>' &&
            html.charAt(i) != '/') i += 1
        val aname = html.substring(as, i)
          .toLowerCase(java.util.Locale.ROOT)
        while (i < n && html.charAt(i).isWhitespace) i += 1
        if (i < n && html.charAt(i) == '=') {
          i += 1
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i)
            val vs = i + 1
            val ve = html.indexOf(q, vs)
            val end = if (ve < 0) n else ve
            attrs += (aname -> unescape(html.substring(vs, end)))
            i = if (ve < 0) n else ve + 1
          } else {
            val vs = i
            while (i < n && !html.charAt(i).isWhitespace &&
                html.charAt(i) != '>') i += 1
            // HTML5 folds a trailing '/' of a self-closing tag into an
            // unquoted value (<img src=x.png/> → "x.png/"), but the
            // author meant x.png — strip it ONLY in that position, so
            // href=/about and full URLs keep their slashes (and a bare
            // href=/ keeps its single one). Accepted cost: a genuine
            // directory URL written unquoted against '>' (<a
            // href=/docs/>) also sheds its slash — indistinguishable
            // from the self-closing idiom, and the idiom is the far
            // more common shape in crawled HTML.
            val ve =
              if (i < n && html.charAt(i) == '>' && i - vs > 1 &&
                  html.charAt(i - 1) == '/') i - 1
              else i
            attrs += (aname -> unescape(html.substring(vs, ve)))
          }
        } else if (aname.nonEmpty) attrs += (aname -> "")
        else i += 1 // defensive: never stall
      }
    }
    (if (closing) "/" + name else name, attrs, i)
  }

  private val SkipContent = Set("script", "style", "title", "noscript")
  private val Headings = Map("h1" -> 1, "h2" -> 2, "h3" -> 3,
    "h4" -> 4, "h5" -> 5, "h6" -> 6)

  def toMarkdown(html: String): String = {
    val n = html.length
    // (listGroup, text): consecutive blocks of the SAME list group ≥ 0
    // join with single '\n'; everything else joins with blank lines
    val blocks = mutable.ArrayBuffer.empty[(Int, String)]
    val inline = new StringBuilder
    var prefix = ""
    var blockGroup = -1
    // open inline wrappers: (tag, buffer offset, href/src payload)
    var wrappers = List.empty[(String, Int, String)]
    // (ordered, counter, group id): the group id is FROZEN at list
    // open — after a nested list closes, outer items must keep THEIR
    // list's id, not the global count (else one outer list renders
    // split around the nested one's items)
    var listStack = List.empty[(Boolean, Int, Int)]
    var listGroups = 0
    // tables: first row is the header row (pipe table + --- separator)
    var tableRows: mutable.ArrayBuffer[Seq[String]] = null
    var rowCells: mutable.ArrayBuffer[String] = null
    var i = 0

    // text nodes are entity-decoded ON APPEND (entities never span
    // node boundaries), so flush/wrap only collapse — no double-decode
    def flush(): Unit = {
      val body = collapse(inline.toString)
      if (body.nonEmpty) blocks += ((blockGroup, prefix + body))
      inline.setLength(0)
      wrappers = Nil
      prefix = ""
      blockGroup = -1
    }
    def wrap(tag: String, open: String, close: String): Unit =
      wrappers.headOption.filter(_._1 == tag).foreach { case (_, at, pay) =>
        wrappers = wrappers.tail
        val inner = collapse(inline.substring(at))
        inline.setLength(at)
        tag match {
          case "a" => inline.append('[').append(inner).append("](")
            .append(pay).append(')')
          case _ =>
            if (inner.nonEmpty)
              inline.append(open).append(inner).append(close)
        }
      }

    def emitTable(): Unit = {
      if (tableRows != null && tableRows.nonEmpty) {
        val width = tableRows.map(_.size).max
        def row(cells: Seq[String]): String =
          "| " + cells.padTo(width, "").mkString(" | ") + " |"
        val sep = "| " + Seq.fill(width)("---").mkString(" | ") + " |"
        blocks += ((-1,
          (row(tableRows.head) +: sep +: tableRows.tail.map(row))
            .mkString("\n")))
      }
      tableRows = null
      rowCells = null
      inline.setLength(0)
      wrappers = Nil
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { inline.append(unescape(html.substring(i, n))); i = n }
      else {
        if (lt > i) inline.append(unescape(html.substring(i, lt)))
        if (html.regionMatches(lt, "<!--", 0, 4)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else {
          val (name, attrs, next) = parseTag(html, lt)
          i = next
          name match {
            case t if SkipContent.contains(t) =>
              val close = ciIndexOf(html, s"</$t", i)
              i = if (close < 0) n
              else {
                val gt = html.indexOf('>', close)
                if (gt < 0) n else gt + 1
              }
            case "pre" =>
              flush()
              val close = ciIndexOf(html, "</pre", i)
              val end = if (close < 0) n else close
              var body = html.substring(i, end)
              // strip a single wrapping <code> — the html5 idiom
              val cOpen = ciIndexOf(body, "<code", 0)
              if (cOpen >= 0) {
                val gt = body.indexOf('>', cOpen)
                val cClose = ciIndexOf(body, "</code", gt + 1)
                if (gt >= 0 && cClose >= 0)
                  body = body.substring(gt + 1, cClose)
              }
              val code = unescape(body).stripPrefix("\n")
                .reverse.dropWhile(c => c == '\n' || c == ' ').reverse
              blocks += ((-1, "```\n" + code + "\n```"))
              i = if (close < 0) n
              else {
                val gt = html.indexOf('>', close)
                if (gt < 0) n else gt + 1
              }
            case t if Headings.contains(t) =>
              flush(); prefix = "#" * Headings(t) + " "
            case "/h1" | "/h2" | "/h3" | "/h4" | "/h5" | "/h6" | "/p" |
                "/div" | "/blockquote" | "/li" =>
              flush()
            case "p" | "div" => flush()
            case "table" =>
              flush(); tableRows = mutable.ArrayBuffer.empty
            case "tr" =>
              if (tableRows != null) {
                inline.setLength(0); wrappers = Nil
                rowCells = mutable.ArrayBuffer.empty
              } else flush()
            case "td" | "th" =>
              if (rowCells != null) { inline.setLength(0); wrappers = Nil }
              else flush()
            case "/td" | "/th" =>
              if (rowCells != null) {
                rowCells += collapse(inline.toString)
                inline.setLength(0); wrappers = Nil
              } else flush()
            case "/tr" =>
              if (tableRows != null) {
                if (rowCells != null && rowCells.nonEmpty)
                  tableRows += rowCells.toSeq
                rowCells = null
              } else flush()
            case "/table" => emitTable()
            case "blockquote" => flush(); prefix = "> "
            case "ul" | "ol" =>
              flush()
              listGroups += 1
              listStack ::= (name == "ol", 0, listGroups)
            case "/ul" | "/ol" =>
              flush()
              if (listStack.nonEmpty) listStack = listStack.tail
            case "li" =>
              flush()
              listStack match {
                case (ordered, k, g) :: rest =>
                  listStack = (ordered, k + 1, g) :: rest
                  prefix = if (ordered) s"${k + 1}. " else "- "
                  blockGroup = g
                case Nil => prefix = "- " // stray li: still a bullet
              }
            case "br" => inline.append(Br)
            case "img" =>
              inline.append("![").append(attrs.getOrElse("alt", ""))
                .append("](").append(attrs.getOrElse("src", "")).append(')')
            case "a" =>
              wrappers ::= (("a", inline.length,
                attrs.getOrElse("href", "")))
            case "b" | "strong" =>
              wrappers ::= (("b", inline.length, ""))
            case "i" | "em" =>
              wrappers ::= (("i", inline.length, ""))
            case "code" =>
              wrappers ::= (("code", inline.length, ""))
            case "/a" => wrap("a", "[", "]")
            case "/b" | "/strong" => wrap("b", "**", "**")
            case "/i" | "/em" => wrap("i", "*", "*")
            case "/code" => wrap("code", "`", "`")
            case _ => () // unknown/structural tags: text flows through
          }
        }
      }
    }
    if (tableRows != null) emitTable() // unclosed table: keep its rows
    flush()
    // join: same-list-group runs with '\n', block boundaries with '\n\n'
    val out = new StringBuilder
    var prevGroup = Int.MinValue
    for (((g, text), idx) <- blocks.zipWithIndex) {
      if (idx > 0)
        out.append(if (g >= 0 && g == prevGroup) "\n" else "\n\n")
      out.append(text)
      prevGroup = g
    }
    out.toString
  }

  // ------------------------------------------------------------------
  // Spark stage + fixture twin
  // ------------------------------------------------------------------

  /** (id, html) → (doc_id, markdown): per-row string walk in
    * mapPartitions — no shuffle, no UDF registry, scales with the
    * scan.
    */
  def htmlToMarkdown(docs: Dataset[(java.lang.Long, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (boxed, html) =>
      (boxed.longValue(), toMarkdown(html))
    }).toDF("doc_id", "markdown")
  }

  /** String-keyed variant for page tables (e.g. the raw-WARC source's
    * (page_url, html) frame): → (page_url, markdown).
    */
  def htmlToMarkdownKeyed(docs: Dataset[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (key, html) =>
      (key, toMarkdown(html))
    }).toDF("page_url", "markdown")
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** The q_html_markdown fixture page: every rendering rule exercised
    * (skipped head/script/style, comment trap, ws collapse in the h1,
    * both list kinds, fenced code with entities, inline wrappers,
    * link/image/inline-code composition) — all closed-form from
    * (id, text) so the oracle rebuilds the exact markdown in SQL.
    */
  private[graft] def syntheticHtmlFor(id: Long, text: String): String =
    s"""<html><head><title>Doc $id</title>
       |<style>p { color: red }</style>
       |<script>var fake = "<h1>not a heading</h1>";</script>
       |</head>
       |<body>
       |<!-- <h1>commented out</h1> -->
       |<h1>Doc
       |   $id</h1>
       |<p>
       |  ${esc(text)}
       |</p>
       |<ul>
       |  <li>item A${id % 7}</li>
       |  <li><b>bold</b> B${id % 5}</li>
       |</ul>
       |<ol>
       |  <li>first C${id % 3}</li>
       |  <li><i>second</i></li>
       |</ol>
       |<pre><code>val x = $id &lt; ${id + 1}</code></pre>
       |<table>
       |  <tr><th>k</th><th>v</th></tr>
       |  <tr><td>rows</td><td>${id % 9}</td></tr>
       |  <tr><td><b>cols</b></td><td>${id % 11}</td></tr>
       |</table>
       |<blockquote>quote ${id % 3}</blockquote>
       |<p>See <a href="https://x.test/$id">link ${id % 4}</a> and
       |<img src="i$id.png" alt="alt ${id % 6}"> with
       |<code>inline ${id % 2}</code> code &amp; entities.</p>
       |</body></html>""".stripMargin

  def syntheticHtmlDocs(docs: Dataset[(java.lang.Long, String)])
      : Dataset[(java.lang.Long, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.map { case (boxed, text) =>
      (boxed, syntheticHtmlFor(boxed.longValue(), text))
    })
  }
}
