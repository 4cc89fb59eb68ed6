package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** RSS/Atom feed parsing: dialect detection per block kind, attribute
  * vs element links, date fallbacks, CDATA/entity titles, gzip path,
  * hostile input, the Spark stage.
  */
class FeedsSpec extends AnyFunSuite with SparkTestBase {

  test("RSS 2.0: element links, pubDate, CDATA and entity titles") {
    val xml =
      """<rss version="2.0"><channel>
        |  <title>The Site</title>
        |  <item><title><![CDATA[A & B]]></title>
        |    <link>https://e.test/a?x=1&amp;y=2</link>
        |    <pubDate>01 Jan 2024 00:00:00 GMT</pubDate></item>
        |  <item><title>Two &lt;3</title><link>https://e.test/b</link></item>
        |</channel></rss>""".stripMargin
    assert(Feeds.parseFeed(xml) == Seq(
      Feeds.FeedEntry("rss", "A & B", "https://e.test/a?x=1&y=2",
        "01 Jan 2024 00:00:00 GMT"),
      Feeds.FeedEntry("rss", "Two <3", "https://e.test/b", "")))
  }

  test("Atom: href attribute links, published falls back to updated") {
    val xml =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |  <entry><title>E1</title>
        |    <link rel="alternate" href="https://e.test/1"/>
        |    <published>2024-01-01T00:00:00Z</published></entry>
        |  <entry><title>E2</title><link href="https://e.test/2"/>
        |    <updated>2024-02-01T00:00:00Z</updated></entry>
        |</feed>""".stripMargin
    assert(Feeds.parseFeed(xml) == Seq(
      Feeds.FeedEntry("atom", "E1", "https://e.test/1",
        "2024-01-01T00:00:00Z"),
      Feeds.FeedEntry("atom", "E2", "https://e.test/2",
        "2024-02-01T00:00:00Z")))
  }

  test("namespace-prefixed Atom parses like the plain form") {
    val xml =
      """<a:feed xmlns:a="http://www.w3.org/2005/Atom">
        |  <a:entry><a:title>P</a:title>
        |    <a:link href="https://e.test/p"/>
        |    <a:updated>2024-03-01T00:00:00Z</a:updated></a:entry>
        |</a:feed>""".stripMargin
    assert(Feeds.parseFeed(xml).map(e => (e.title, e.link)) ==
      Seq(("P", "https://e.test/p")))
  }

  test("hostile input: garbage, truncations, empty never throw") {
    assert(Feeds.parseFeed("").isEmpty)
    assert(Feeds.parseFeed("not xml & < >").isEmpty)
    assert(Feeds.parseFeed("<item><title>x").isEmpty)
    val ok = "<rss><channel><item><title>t</title>" +
      "<link>https://e.test/x</link></item></channel></rss>"
    for (cut <- 0 to ok.length by 3) Feeds.parseFeed(ok.take(cut))
    // an hreflang attribute must not satisfy an href probe
    val tricky = "<feed><entry><title>t</title>" +
      "<link hreflang=\"en\" href=\"https://e.test/h\"/></entry></feed>"
    assert(Feeds.parseFeed(tricky).head.link == "https://e.test/h")
  }

  test("attr tokenizer: quoted decoys and unquoted URLs with slashes") {
    // attribute-like text INSIDE another attribute's value must not
    // win over the real attribute
    val decoy = "<feed><entry><title>t</title>" +
      "<link title=\"see href=x\" href=\"https://real.test/\"/></entry></feed>"
    assert(Feeds.parseFeed(decoy).head.link == "https://real.test/")
    // unquoted href keeps its interior slashes
    val unq = "<feed><entry><title>t</title>" +
      "<link href=https://e.test/a/b ></link></entry></feed>"
    assert(Feeds.parseFeed(unq).head.link == "https://e.test/a/b")
  }

  test("a self-closing item does not swallow the next sibling") {
    val xml = "<rss><channel><item/>" +
      "<item><title>A</title><link>https://e.test/a</link></item>" +
      "<item><title>B</title><link>https://e.test/b</link></item>" +
      "</channel></rss>"
    assert(Feeds.parseFeed(xml).map(_.title) == Seq("A", "B"))
  }

  test("oversized declared gzip fails closed, never throws") {
    // a bomb-shaped payload: gzip of 100 MiB of zeros exceeds the
    // 64 MiB ceiling -> empty, no throw
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    val chunk = new Array[Byte](1 << 20)
    for (_ <- 1 to 100) gz.write(chunk)
    gz.close()
    assert(Feeds.parseFeedBytes(bos.toByteArray).isEmpty)
    assert(Robots.parseSitemapBytes(bos.toByteArray).isEmpty)
  }

  test("gzip bytes path round-trips; truncated gzip fails closed") {
    val xml = "<rss><channel><item><title>z</title>" +
      "<link>https://e.test/z</link></item></channel></rss>"
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(xml.getBytes("UTF-8"))
    gz.close()
    assert(Feeds.parseFeedBytes(bos.toByteArray) ==
      Feeds.parseFeed(xml))
    assert(Feeds.parseFeedBytes(bos.toByteArray.take(8)).isEmpty)
  }

  test("feedEntries stage over the synthetic corpus") {
    import spark.implicits._
    val ids = spark.createDataset((0L to 9L).map(java.lang.Long.valueOf))
    val out = Feeds.feedEntries(Feeds.syntheticFeeds(ids))
      .as[(Long, String, String, String, String)].collect()
      .groupBy(_._1)
    // id=0: rss, gzipped, 1 item with CDATA title
    assert(out(0L).toSeq == Seq((0L, "rss", "Post 1 & notes",
      "https://n0.test/post1?u=1&v=2", "01 Jan 2024 00:00:00 GMT")))
    // id=1: atom, 2 entries (1 + 1%2)
    assert(out(1L).length == 2 &&
      out(1L).forall(e => e._2 == "atom" && e._4.startsWith("https://n1.test/e")))
    // id=3: atom + gzipped (3%3==0)
    assert(out(3L).length == 2 && out(3L).head._2 == "atom")
  }
}
