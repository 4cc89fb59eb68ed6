package graft.ext

/** Tolerant tag-scan primitives shared by the crawl-discovery parsers
  * ([[Robots]] sitemaps, [[Feeds]] RSS/Atom): namespace-prefix and
  * attribute tolerance, CDATA-or-entity text extraction. A tag SCAN,
  * deliberately not an XML parser — hostile input yields fewer
  * fields, never a throw, and every cursor is monotonic.
  */
private[ext] object XmlScan {

  /** True when the qname at `at` (just past '<' or "</") has local
    * name `local`: an optional `prefix:` is skipped, the match is
    * case-insensitive, and the name must be DELIMITED by whitespace,
    * '>', or '/' — so `<sitemapindex>` never matches a `sitemap`
    * probe.
    */
  def qnameMatches(xml: String, at: Int, local: String): Boolean = {
    var j = at
    val n = xml.length
    while (j < n && (xml.charAt(j).isLetterOrDigit ||
        xml.charAt(j) == '_' || xml.charAt(j) == '-')) j += 1
    var start = at
    if (j < n && xml.charAt(j) == ':') { // namespace prefix: skip it
      start = j + 1
      j = start
      while (j < n && (xml.charAt(j).isLetterOrDigit ||
          xml.charAt(j) == '_' || xml.charAt(j) == '-')) j += 1
    }
    j - start == local.length &&
      xml.regionMatches(true, start, local, 0, local.length) &&
      (j >= n || xml.charAt(j).isWhitespace || xml.charAt(j) == '>' ||
        xml.charAt(j) == '/')
  }

  /** Index of the '<' opening a `local` tag (prefix/attr-tolerant) at
    * or after `from`; -1 when absent.
    */
  def tagOpen(xml: String, local: String, from: Int): Int = {
    var i = xml.indexOf('<', from)
    while (i >= 0) {
      if (i + 1 < xml.length && xml.charAt(i + 1) != '/' &&
          qnameMatches(xml, i + 1, local)) return i
      i = xml.indexOf('<', i + 1)
    }
    -1
  }

  /** Index of the "</" closing a `local` tag at or after `from`. */
  def tagClose(xml: String, local: String, from: Int): Int = {
    var i = xml.indexOf("</", from)
    while (i >= 0) {
      if (qnameMatches(xml, i + 2, local)) return i
      i = xml.indexOf("</", i + 1)
    }
    -1
  }

  /** All `local` block bodies in document order (content between the
    * open tag's '>' and the matching close), capped at 65536 —
    * unclosed tails yield what parsed so far. A SELF-CLOSING member
    * (`<item/>`) has no body and must not swallow the next sibling's
    * content: it is skipped, not treated as an open tag.
    */
  def blocks(xml: String, local: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = tagOpen(xml, local, 0)
    var seen = 0
    while (i >= 0 && seen < 65536) {
      seen += 1
      val gt = xml.indexOf('>', i)
      if (gt < 0) return out.toSeq
      if (xml.charAt(gt - 1) == '/') i = tagOpen(xml, local, gt + 1)
      else {
        val close = tagClose(xml, local, gt + 1)
        if (close < 0) return out.toSeq
        out += xml.substring(gt + 1, close)
        i = tagOpen(xml, local, close + 1)
      }
    }
    out.toSeq
  }

  /** Text content of the FIRST `local` tag inside `block`: trimmed,
    * CDATA taken verbatim, entity-decoded otherwise; "" when absent,
    * self-closing, or unclosed.
    */
  def field(block: String, local: String): String = {
    val open = tagOpen(block, local, 0)
    if (open < 0) return ""
    val gt = block.indexOf('>', open)
    if (gt < 0) return ""
    if (block.charAt(gt - 1) == '/') return "" // self-closing: empty
    val close = tagClose(block, local, gt + 1)
    if (close < 0) return ""
    val raw = block.substring(gt + 1, close).trim
    val text =
      if (raw.startsWith("<![CDATA[")) {
        val e = raw.indexOf("]]>")
        if (e < 0) raw.substring(9) else raw.substring(9, e)
      } else HtmlEntities.unescape(raw)
    text.trim
  }

  /** Value of `attr` on the FIRST `local` tag inside `block` (the
    * Atom `<link href=...>` shape): a real attribute TOKENIZER, not a
    * substring probe — names and values are walked in sequence, so
    * attribute-like text INSIDE another attribute's quoted value
    * (`title="see href=x"`) can never match. Values are quoted or
    * unquoted, entity-decoded; unquoted values keep interior slashes
    * (`href=https://e.test/p`) and shed only a trailing '/' that is
    * the self-closing solidus against '>'; "" when tag or attribute
    * is absent.
    */
  def attr(block: String, local: String, attr: String): String = {
    val open = tagOpen(block, local, 0)
    if (open < 0) return ""
    val gt = block.indexOf('>', open)
    val end = if (gt < 0) block.length else gt
    // skip past the (possibly prefixed) tag name
    var i = open + 1
    while (i < end && !block.charAt(i).isWhitespace) i += 1
    while (i < end) {
      val c = block.charAt(i)
      if (c.isWhitespace || c == '/') i += 1
      else {
        val ns = i // attribute name
        while (i < end && !block.charAt(i).isWhitespace &&
            block.charAt(i) != '=' && block.charAt(i) != '/') i += 1
        val name = block.substring(ns, i)
        while (i < end && block.charAt(i).isWhitespace) i += 1
        if (i < end && block.charAt(i) == '=') {
          i += 1
          while (i < end && block.charAt(i).isWhitespace) i += 1
          if (i < end && (block.charAt(i) == '"' || block.charAt(i) == '\'')) {
            val q = block.charAt(i)
            val vs = i + 1
            val ve = block.indexOf(q, vs)
            val stop = if (ve < 0 || ve > end) end else ve
            if (name.equalsIgnoreCase(attr))
              return HtmlEntities.unescape(block.substring(vs, stop))
            i = if (ve < 0 || ve > end) end else ve + 1
          } else {
            val vs = i
            while (i < end && !block.charAt(i).isWhitespace) i += 1
            // self-closing solidus folded into an unquoted value
            val ve =
              if (i == end && i - vs > 1 && block.charAt(i - 1) == '/') i - 1
              else i
            if (name.equalsIgnoreCase(attr))
              return HtmlEntities.unescape(block.substring(vs, ve))
          }
        } else if (name.isEmpty) i += 1 // defensive: never stall
      }
    }
    ""
  }
}
