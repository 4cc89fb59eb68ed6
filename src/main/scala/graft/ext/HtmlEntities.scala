package graft.ext

/** The ONE html-entity decode table shared by every HTML walker
  * (`wat.WarcHtml`'s link scanner and [[HtmlMarkdown]]): an entity
  * added or a decode fix applied in one path must never silently
  * diverge the other.
  */
private[graft] object HtmlEntities {

  /** &amp; LAST: double-unescape is wrong. */
  val Basic: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&amp;" -> "&")

  /** [[Basic]] plus &nbsp; → space — the markdown renderer's table
    * (whitespace-collapse semantics make nbsp a plain space there;
    * the WARC link scanner keeps [[Basic]] so attr/alt text matches
    * the WAT sidecar byte-for-byte).
    */
  val WithNbsp: Seq[(String, String)] =
    Basic.init ++ Seq("&nbsp;" -> " ", "&amp;" -> "&")

  def unescape(s: String, table: Seq[(String, String)] = Basic): String = {
    if (s.indexOf('&') < 0) return s
    var out = s
    for ((e, c) <- table) out = out.replace(e, c)
    out
  }
}
