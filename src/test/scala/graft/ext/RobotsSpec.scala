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

  test("gateByDomain: broadcast per-domain parse over the frontier") {
    import spark.implicits._
    val ids = spark.createDataset((0L to 29L).map(java.lang.Long.valueOf))
    val (pages, robots) = Robots.syntheticFrontier(ids)
    val out = Robots.gateByDomain(pages, robots, "graftbot")
      .as[(Long, String, String, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    for (id <- 0L to 29L) {
      val kind = (id % 50) % 3
      val want =
        if (kind == 2) true
        else if (kind == 1) id % 6 != 4
        else !(id % 6 == 1 || id % 6 == 3)
      assert(out(id) == want, s"id=$id kind=$kind path#${id % 6}")
    }
  }
}
