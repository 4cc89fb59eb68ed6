package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** RFC 9309 robots: parser shape, wildcard/$ matching, longest-match
  * precedence with allow-on-tie, group selection, gate stage.
  */
class RobotsSpec extends AnyFunSuite with SparkTestBase {

  test("pattern matching: literals, *, $, greedy ordered substrings") {
    assert(Robots.matches("/", "/anything"))
    assert(Robots.matches("/fish", "/fish.html"))
    assert(!Robots.matches("/fish", "/Fish")) // case-sensitive paths
    assert(Robots.matches("/*.php", "/folder/filename.php?parameters"))
    assert(Robots.matches("/fish*.php", "/fishheads/catfish.php?p=1"))
    assert(!Robots.matches("/fish*.php", "/fish.PHP"))
    assert(Robots.matches("/*.php$", "/filename.php"))
    assert(!Robots.matches("/*.php$", "/filename.php?parameters"))
    assert(!Robots.matches("/*.php$", "/filename.php5"))
    assert(Robots.matches("/fish$", "/fish"))
    assert(!Robots.matches("/fish$", "/fishing"))
    // multiple stars
    assert(Robots.matches("/a*b*c", "/a-x-b-y-c-z"))
    assert(!Robots.matches("/a*c*b", "/a-b-c"))
  }

  test("parser: groups, comments, empty disallow, crawl-delay") {
    val gs = Robots.parse(
      """# hi
        |User-agent: botA
        |User-agent: botB
        |Disallow: /x
        |Crawl-delay: 1.5
        |
        |User-agent: *
        |Disallow:
        |Allow: /ok
        |Sitemap: https://e.test/s.xml
        |""".stripMargin)
    assert(gs.size == 2)
    assert(gs.head.agents == Seq("bota", "botb"))
    assert(gs.head.rules == Seq((false, "/x")))
    assert(gs.head.crawlDelaySec.contains(1.5))
    // the empty Disallow contributed no rule
    assert(gs(1).agents == Seq("*") && gs(1).rules == Seq((true, "/ok")))
  }

  test("precedence: longest match wins, allow breaks ties") {
    val gs = Robots.parse(
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/ok/
        |Allow: /p
        |Disallow: /p
        |""".stripMargin)
    assert(!Robots.isAllowed(gs, "any", "/private/secret"))
    assert(Robots.isAllowed(gs, "any", "/private/ok/fine"))
    // /p allow and /p disallow tie at length 2 → allow
    assert(Robots.isAllowed(gs, "any", "/page"))
    assert(Robots.isAllowed(gs, "any", "/elsewhere"))
  }

  test("group selection: most specific token wins; * is the fallback") {
    val gs = Robots.parse(Robots.robotsFor(1))
    assert(Robots.isAllowed(gs, "graftbot", "/anything"))
    assert(!Robots.isAllowed(gs, "graftbot", "/nobot/x"))
    // an unmatched agent falls to the star group: everything blocked
    assert(!Robots.isAllowed(gs, "otherbot", "/anything"))
    // token is a PREFIX of the full agent product string
    assert(!Robots.isAllowed(gs, "graftbot/2.1", "/nobot/x"))
    assert(Robots.isAllowed(gs, "graftbot/2.1", "/fine"))
  }

  test("an empty User-agent token is dropped, not a match-everything") {
    val gs = Robots.parse(
      """User-agent:
        |Disallow: /private/
        |
        |User-agent: *
        |Allow: /
        |""".stripMargin)
    // the malformed group has no valid token; the * group governs
    assert(Robots.isAllowed(gs, "anybot", "/private/x"))
  }

  test("no robots row / empty robots → allowed") {
    assert(Robots.isAllowed(Robots.parse(""), "a", "/x"))
    assert(Robots.isAllowed(Robots.parse(Robots.robotsFor(2)), "a", "/x"))
  }

  test("sitemap parsing: urlset, sitemapindex, entities, hostile") {
    val urlset =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://e.test/a?x=1&amp;y=2</loc>
        |    <lastmod>2024-01-02</lastmod><priority>0.8</priority></url>
        |  <url><loc> https://e.test/b </loc></url>
        |</urlset>""".stripMargin
    val es = Robots.parseSitemap(urlset)
    assert(es == Seq(
      Robots.SitemapEntry("url", "https://e.test/a?x=1&y=2",
        "2024-01-02", "0.8"),
      Robots.SitemapEntry("url", "https://e.test/b", "", "")))
    val index =
      """<sitemapindex>
        |  <sitemap><loc>https://e.test/s1.xml</loc></sitemap>
        |  <sitemap><loc>https://e.test/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Robots.parseSitemap(index).map(_.loc) ==
      Seq("https://e.test/s1.xml", "https://e.test/s2.xml"))
    // hostile: truncated/garbage yields fewer entries, never a throw
    assert(Robots.parseSitemap("").isEmpty)
    assert(Robots.parseSitemap("<url><loc>x").isEmpty)
    assert(Robots.parseSitemap("not xml at all & < >").isEmpty)
    Robots.parseSitemap(urlset.take(80)) // no throw is the property
  }

  test("gateByDomain: executor-side parse, both join shapes agree") {
    import spark.implicits._
    val ids = spark.createDataset((0L to 29L).map(java.lang.Long.valueOf))
    val (pages, robots) = Robots.syntheticFrontier(ids)
    // broadcast path (default) and the shuffle equi-join path
    // (threshold 0 forces it) must produce identical gates
    for (threshold <- Seq(1000000L, 0L)) {
      val out = Robots.gateByDomain(pages, robots, "graftbot", threshold)
        .as[(Long, String, String, Boolean, Option[Double])].collect()
        .map(r => r._1 -> ((r._4, r._5))).toMap
      for (id <- 0L to 29L) {
        val kind = (id % 50) % 3
        val want =
          if (kind == 2) true
          else if (kind == 1) id % 6 != 4
          else !(id % 6 == 1 || id % 6 == 3)
        val wantDelay = if (kind == 0) Some(2.0) else None
        assert(out(id) == ((want, wantDelay)),
          s"id=$id kind=$kind path#${id % 6} threshold=$threshold")
      }
    }
  }

  test("a pinned broadcast threshold skips the robots.count() job") {
    import spark.implicits._
    val pages = Seq((1L, "d.test", "/x")).toDF("doc_id", "domain", "path")
    // a robots frame whose SCAN is observable: any job that touches it
    // bumps the accumulator
    val scans = spark.sparkContext.longAccumulator("robots-scans")
    val robots = spark.createDataset(Seq(("d.test", "User-agent: *\n")))
      .mapPartitions { it => scans.add(1L); it }
      .toDF("domain", "robots")
    // pinned shapes: CONSTRUCTING the gate runs no job at all — the
    // registered queries pass Long.MaxValue for exactly this reason
    // (the default threshold pays one robots.count() job per gate call)
    Robots.gateByDomain(pages, robots, "graftbot", Long.MaxValue)
    Robots.gateByDomain(pages, robots, "graftbot", 0L)
    assert(scans.value == 0L,
      "a pinned threshold must not run any eager job at construction")
    // the default threshold decides by counting the small side: one
    // eager scan happens before any action — the job the pin saves
    Robots.gateByDomain(pages, robots, "graftbot")
    assert(scans.value > 0L,
      "the default threshold is expected to pay the counting job " +
        "(if this starts passing, the default got lazy — update the " +
        "registered queries' rationale)")
  }

  test("gateByDomain: a frontier domain with NO robots row is allowed") {
    import spark.implicits._
    val pages = Seq((1L, "nowhere.test", "/private/x"))
      .toDF("doc_id", "domain", "path")
    val robots = Seq(("elsewhere.test", "User-agent: *\nDisallow: /\n"))
      .toDF("domain", "robots")
    val out = Robots.gateByDomain(pages, robots, "graftbot")
      .as[(Long, String, String, Boolean, Option[Double])].collect()
    assert(out.toSeq == Seq((1L, "nowhere.test", "/private/x", true, None)))
  }

  test("crawlDelayFor follows group selection") {
    val gs = Robots.parse(
      """User-agent: graftbot
        |Disallow: /x
        |
        |User-agent: *
        |Disallow: /
        |Crawl-delay: 9
        |""".stripMargin)
    // graftbot's group has no delay; the star group's must NOT leak
    assert(Robots.crawlDelayFor(gs, "graftbot").isEmpty)
    assert(Robots.crawlDelayFor(gs, "otherbot").contains(9.0))
  }

  test("sitemap realism: namespace prefixes, attributes, CDATA, gzip") {
    val xml =
      """<?xml version="1.0"?>
        |<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sm:url data-x="1"><sm:loc><![CDATA[https://e.test/a?x=1&y=2]]>
        |    </sm:loc><sm:lastmod>2024-03-04</sm:lastmod></sm:url>
        |  <sm:url><sm:loc>https://e.test/b?p=1&amp;q=2</sm:loc></sm:url>
        |</sm:urlset>""".stripMargin
    val es = Robots.parseSitemap(xml)
    assert(es == Seq(
      Robots.SitemapEntry("url", "https://e.test/a?x=1&y=2",
        "2024-03-04", ""),
      Robots.SitemapEntry("url", "https://e.test/b?p=1&q=2", "", "")))
    // gzip round trip through the bytes entry point
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(xml.getBytes("UTF-8"))
    gz.close()
    assert(Robots.parseSitemapBytes(bos.toByteArray) == es)
    assert(Robots.parseSitemapBytes(xml.getBytes("UTF-8")) == es)
    // truncated gzip fails closed
    assert(Robots.parseSitemapBytes(bos.toByteArray.take(10)).isEmpty)
    // self-closing loc yields no entry
    assert(Robots.parseSitemap("<url><loc/></url>").isEmpty)
  }
}
