package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** HTML → Markdown walker: block structure, inline wrappers, lists,
  * fenced code, traps (script/style/title/comments), whitespace
  * collapse, hard breaks, hostile input.
  */
class HtmlMarkdownSpec extends AnyFunSuite with SparkTestBase {

  private def md(html: String) = HtmlMarkdown.toMarkdown(html)

  test("headings, paragraphs, whitespace collapse") {
    assert(md("<h1>Big   Title</h1><p>a  b\n c</p><h3>Sub</h3>") ==
      "# Big Title\n\na b c\n\n### Sub")
  }

  test("inline wrappers: links, images, bold, italic, code") {
    assert(md("""<p>See <a href="https://e.test/x">the  docs</a> and
      |<img src="p.png" alt="a pic"> plus <b>bold</b>, <em>it</em>,
      |<code> tt </code>.</p>""".stripMargin) ==
      "See [the docs](https://e.test/x) and ![a pic](p.png) plus " +
        "**bold**, *it*, `tt`.")
  }

  test("unordered + ordered lists, items join with single newlines") {
    assert(md("<ul><li>one</li><li>two</li></ul>" +
      "<ol><li>first</li><li>second</li></ol>") ==
      "- one\n- two\n\n1. first\n2. second")
  }

  test("pre/code fences: no ws collapse, entities decoded, code strip") {
    assert(md("<pre><code>if (a &lt; b)\n  run()</code></pre>") ==
      "```\nif (a < b)\n  run()\n```")
    assert(md("<pre>plain  spaced</pre>") == "```\nplain  spaced\n```")
  }

  test("blockquote prefix and br hard break") {
    assert(md("<blockquote>wise  words</blockquote>") == "> wise words")
    assert(md("<p>line one<br>line two</p>") == "line one\nline two")
  }

  test("tables render as pipe tables, short rows padded, inline kept") {
    assert(md("""<table><tr><th>a</th><th>b</th></tr>
      |<tr><td><i>x</i></td><td>1</td></tr>
      |<tr><td>y</td></tr></table>""".stripMargin) ==
      "| a | b |\n| --- | --- |\n| *x* | 1 |\n| y |  |")
    // unclosed table still emits its completed rows
    assert(md("<table><tr><td>q</td><td>r</td></tr>") ==
      "| q | r |\n| --- | --- |")
    // whitespace between table tags contributes nothing
    assert(md("<p>before</p><table> \n <tr> <td>c</td> </tr> \n </table>") ==
      "before\n\n| c |\n| --- |")
  }

  test("traps contribute nothing: head/title/script/style/comments") {
    val html = """<html><head><title>T</title><style>p{}</style>
      |<script>var x = "<h1>fake</h1>";</script></head><body>
      |<!-- <p>gone</p> --><p>real</p></body></html>""".stripMargin
    assert(md(html) == "real")
  }

  test("entities decode exactly once; &amp;lt; stays &lt;") {
    assert(md("<p>fish &amp; chips &lt;now&gt; &amp;lt;</p>") ==
      "fish & chips <now> &lt;")
  }

  test("hostile input never throws, degrades to text") {
    md("<a href='x'>unclosed")
    md("</b></i>stray closes<ul>")
    md("<p>" + "<" * 100)
    md("<pre>never closed")
    md("")
    // unclosed wrapper: markers dropped, text kept
    assert(md("<p><b>loud") == "loud")
    // mismatched close: wrapper ignored
    assert(md("<p><b>x</i>y</b>z</p>") == "**xy**z")
  }

  test("fixture page renders to the oracle's literal markdown") {
    val id = 5L
    val text = "alpha beta gamma"
    val got = md(HtmlMarkdown.syntheticHtmlFor(id, text))
    val want =
      s"""# Doc $id
         |
         |$text
         |
         |- item A${id % 7}
         |- **bold** B${id % 5}
         |
         |1. first C${id % 3}
         |2. *second*
         |
         |```
         |val x = $id < ${id + 1}
         |```
         |
         || k | v |
         || --- | --- |
         || rows | ${id % 9} |
         || **cols** | ${id % 11} |
         |
         |> quote ${id % 3}
         |
         |See [link ${id % 4}](https://x.test/$id) and ![alt ${id % 6}](i$id.png) with `inline ${id % 2}` code & entities.""".stripMargin
    assert(got == want)
  }

  test("a nested list does not split the outer list's items") {
    // outer items before AND after the nested ul share one group: the
    // outer list renders contiguously (single newlines), the nested
    // one is its own block
    val md = HtmlMarkdown.toMarkdown(
      "<ul><li>a</li><li>b<ul><li>x</li><li>y</li></ul></li>" +
        "<li>c</li><li>d</li></ul>")
    assert(md == "- a\n- b\n\n- x\n- y\n\n- c\n- d", md)
    // two SIBLING lists still render as distinct blocks
    val sib = HtmlMarkdown.toMarkdown(
      "<ul><li>a</li></ul><ul><li>b</li></ul>")
    assert(sib == "- a\n\n- b", sib)
  }

  test("self-closing tags with unquoted attrs drop only the stray '/'") {
    assert(HtmlMarkdown.toMarkdown("<p><img src=x.png/></p>")
      == "![](x.png)")
    // real slashes inside unquoted values survive
    assert(HtmlMarkdown.toMarkdown("<p><a href=/about>go</a></p>")
      == "[go](/about)")
    assert(HtmlMarkdown.toMarkdown("<p><a href=https://e.test/a/b>x</a></p>")
      == "[x](https://e.test/a/b)")
    // a bare root href keeps its single slash
    assert(HtmlMarkdown.toMarkdown("<p><a href=/>r</a></p>") == "[r](/)")
  }

  test("htmlToMarkdown stage over the synthetic corpus") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      (java.lang.Long.valueOf(1L), "one two"),
      (java.lang.Long.valueOf(2L), "three")))
    val out = HtmlMarkdown.htmlToMarkdown(
      HtmlMarkdown.syntheticHtmlDocs(docs))
      .as[(Long, String)].collect().toMap
    assert(out(1L).startsWith("# Doc 1\n\none two\n\n- item A1"))
    assert(out(2L).contains("[link 2](https://x.test/2)"))
  }
}
