package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

/** RSS 2.0 / Atom feed parsing — the THIRD crawl-discovery channel
  * beside robots-declared sitemaps and sitemap files ([[Robots]]):
  * feeds enumerate a site's RECENT documents with titles and dates,
  * which a recency-weighted frontier consumes directly.
  *
  * Same discipline as the sitemap parser ([[XmlScan]]): tolerant tag
  * scan (namespace prefixes, attributes, CDATA — feeds are the most
  * mangled XML on the public web), hostile input yields fewer entries
  * and never throws.
  *
  * Dialect handling: `<item>` blocks are RSS (link is ELEMENT TEXT,
  * date is `pubDate`), `<entry>` blocks are Atom (link is the `href`
  * ATTRIBUTE of `<link>`, date is `published` falling back to
  * `updated`). A document carrying both kinds of blocks yields both
  * (seen in the wild from template mashups).
  */
object Feeds {

  /** One feed entry: kind = "rss" | "atom"; published is the raw date
    * string (RFC 822 for RSS, RFC 3339 for Atom — normalization is a
    * downstream concern, the raw string is the parse witness).
    */
  final case class FeedEntry(kind: String, title: String, link: String,
      published: String)

  def parseFeed(xml: String): Seq[FeedEntry] = {
    import XmlScan.{attr, blocks, field}
    val rss = blocks(xml, "item").map { b =>
      FeedEntry("rss", field(b, "title"), field(b, "link"),
        field(b, "pubDate"))
    }
    val atom = blocks(xml, "entry").map { b =>
      val published = field(b, "published") match {
        case "" => field(b, "updated")
        case p => p
      }
      // Atom prefers <link rel="alternate" href=...>; the scan takes
      // the FIRST link's href, the overwhelmingly common layout
      FeedEntry("atom", field(b, "title"), attr(b, "link", "href"),
        published)
    }
    (rss ++ atom).filter(e => e.link.nonEmpty || e.title.nonEmpty)
  }

  /** Bytes-as-fetched: gzip-tolerant + charset-sniffed, like
    * [[Robots.parseSitemapBytes]] (feeds gzip the same way;
    * [[Gunzip.capped]] is the shared fail-closed path).
    */
  def parseFeedBytes(b: Array[Byte]): Seq[FeedEntry] =
    Gunzip.capped(b, 1 << 26) match {
      case Some(xml) => parseFeed(Charsets.decode(xml)._1)
      case None => Seq.empty
    }

  // ------------------------------------------------------------------
  // Spark stage + fixture twin
  // ------------------------------------------------------------------

  /** (doc_id, bytes) → one row per entry: per-row parse in
    * mapPartitions — zero shuffle, the frontier-seeding shape.
    */
  def feedEntries(docs: Dataset[(java.lang.Long, Array[Byte])])
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap { case (boxed, bytes) =>
      val id = boxed.longValue()
      parseFeedBytes(bytes).iterator.map(e =>
        (id, e.kind, e.title, e.link, e.published))
    }).toDF("doc_id", "kind", "title", "link", "published")
  }

  /** One feed per id for domain n<id>.test: even ids RSS 2.0 with
    * 1+(id%3) items (CDATA title when id%4==0, entity-encoded link
    * query); odd ids Atom with 1+(id%2) namespace-prefixed entries
    * (href attribute links). Gzipped when id%3 == 0 — closed form for
    * the q_feed_entries oracle.
    */
  def syntheticFeeds(ids: Dataset[java.lang.Long])
      : Dataset[(java.lang.Long, Array[Byte])] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val xml =
        if (id % 2 == 0) {
          val items = (1 to (1 + id % 3).toInt).map { j =>
            val title =
              if (id % 4 == 0) s"<![CDATA[Post $j & notes]]>"
              else s"Post $j &amp; notes"
            s"""    <item>
               |      <title>$title</title>
               |      <link>https://n$id.test/post$j?u=1&amp;v=2</link>
               |      <pubDate>0${1 + id % 9} Jan 2024 00:00:00 GMT</pubDate>
               |    </item>""".stripMargin
          }.mkString("\n")
          s"""<?xml version="1.0"?>
             |<rss version="2.0">
             |  <channel>
             |    <title>Site $id</title>
             |$items
             |  </channel>
             |</rss>""".stripMargin
        } else {
          val entries = (1 to (1 + id % 2).toInt).map { j =>
            s"""  <a:entry>
               |    <a:title>Entry $j</a:title>
               |    <a:link rel="alternate" href="https://n$id.test/e$j"/>
               |    <a:updated>2024-0${1 + id % 9}-01T00:00:00Z</a:updated>
               |  </a:entry>""".stripMargin
          }.mkString("\n")
          s"""<a:feed xmlns:a="http://www.w3.org/2005/Atom">
             |$entries
             |</a:feed>""".stripMargin
        }
      val bytes =
        if (id % 3 == 0) {
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(xml.getBytes("UTF-8"))
          gz.close()
          bos.toByteArray
        } else xml.getBytes("UTF-8")
      (boxed, bytes)
    })
  }
}
