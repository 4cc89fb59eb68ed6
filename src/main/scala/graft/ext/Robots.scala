package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** robots.txt parsing + politeness gating (RFC 9309) — the crawl-side
  * admission filter a URL frontier runs before fetching: group
  * selection by most-specific product token, longest-match rule
  * precedence with allow-on-tie, `*` wildcards and the `$` end
  * anchor.
  *
  * Scale shape: robots documents are PER DOMAIN (a tiny table next to
  * a huge URL frontier), so the gate parses each robots once and
  * BROADCASTS the parsed groups to the frontier join — never parse
  * per URL ([[gateByDomain]]).
  */
object Robots {

  /** One group: its user-agent product tokens (lowercased) and rules
    * in file order — (allow?, pattern). Empty-value rules are dropped
    * at parse (an empty Disallow means allow-everything).
    */
  final case class Group(agents: Seq[String],
      rules: Seq[(Boolean, String)], crawlDelaySec: Option[Double])

  /** Parse a robots.txt body: consecutive `User-agent` lines open a
    * group; `Allow`/`Disallow`/`Crawl-delay` attach to the open group;
    * comments (#) and unknown directives (Sitemap, ...) are ignored.
    * Never throws — malformed lines are skipped.
    */
  private final class GroupBuilder {
    val agents = scala.collection.mutable.ArrayBuffer.empty[String]
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    var crawlDelay: Option[Double] = None
    def result: Group = Group(agents.toSeq, rules.toSeq, crawlDelay)
  }

  def parse(txt: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[GroupBuilder]
    var openAgents = false
    for (raw <- txt.linesIterator) {
      val line = raw.indexOf('#') match {
        case -1 => raw
        case h => raw.substring(0, h)
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!openAgents || groups.isEmpty) {
              groups += new GroupBuilder
              openAgents = true
            }
            // an EMPTY product token is invalid (RFC 9309): appending
            // it would make the group match every agent (everything
            // startsWith "") and hijack the * fallback
            if (value.nonEmpty)
              groups.last.agents += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" if groups.nonEmpty =>
            openAgents = false
            if (value.nonEmpty)
              groups.last.rules += ((key == "allow", value))
          case "crawl-delay" if groups.nonEmpty =>
            openAgents = false
            groups.last.crawlDelay = value.toDoubleOption
          case _ => () // sitemap / unknown: not a group boundary
        }
      }
    }
    groups.map(_.result).toSeq
  }

  /** RFC 9309 path matching: literal octets, `*` matches any run,
    * `$` (final char only) anchors the end. Iterative greedy scan —
    * ordered-substring semantics need no backtracking.
    */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val parts = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else if (i == parts.length - 1 && anchored) {
        // the last literal must align at the END of the path
        return path.length - part.length >= pos && path.endsWith(part)
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** The rules governing `agent`: groups whose LONGEST matching product
    * token wins (token a prefix of the agent, case-insensitive); all
    * groups carrying that token combine; `*` groups are the fallback.
    */
  def rulesFor(groups: Seq[Group], agent: String): Seq[(Boolean, String)] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val tokens = groups.flatMap(_.agents).distinct
      .filter(t => t != "*" && a.startsWith(t))
    val chosen =
      if (tokens.nonEmpty) tokens.maxBy(_.length)
      else "*"
    groups.filter(_.agents.contains(chosen)).flatMap(_.rules)
  }

  /** Longest-match precedence over PRE-SELECTED rules, allow on tie,
    * allowed when nothing matches (RFC 9309 §2.2.2).
    */
  def isAllowedByRules(rules: Seq[(Boolean, String)], path: String)
      : Boolean = {
    val hits = rules.filter { case (_, p) => matches(p, path) }
    if (hits.isEmpty) true
    else {
      val longest = hits.map(_._2.length).max
      hits.filter(_._2.length == longest).exists(_._1) // any allow ties win
    }
  }

  def isAllowed(groups: Seq[Group], agent: String, path: String): Boolean =
    isAllowedByRules(rulesFor(groups, agent), path)

  // ------------------------------------------------------------------
  // sitemaps (sitemaps.org protocol) — the DISCOVERY half of crawl
  // politeness: robots gates what may be fetched, sitemaps enumerate
  // what exists
  // ------------------------------------------------------------------

  /** One sitemap entry: kind = "url" (urlset member) or "sitemap"
    * (sitemapindex child); lastmod/priority empty when absent.
    */
  final case class SitemapEntry(kind: String, loc: String,
      lastmod: String, priority: String)

  /** Parse a sitemap.xml body: `<urlset>` → `<url>` members,
    * `<sitemapindex>` → `<sitemap>` children; `<loc>` text is
    * entity-decoded (URLs carry `&amp;`). Tag scan, not an XML parser
    * — hostile input yields fewer entries, never a throw.
    */
  def parseSitemap(xml: String): Seq[SitemapEntry] = {
    def field(block: String, tag: String): String = {
      val open = block.indexOf(s"<$tag>")
      if (open < 0) ""
      else {
        val vs = open + tag.length + 2
        val close = block.indexOf(s"</$tag>", vs)
        if (close < 0) ""
        else HtmlEntities.unescape(block.substring(vs, close).trim)
      }
    }
    def blocks(tag: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = xml.indexOf(s"<$tag>")
      while (i >= 0 && out.size < 65536) {
        val close = xml.indexOf(s"</$tag>", i)
        if (close < 0) return out.toSeq
        out += xml.substring(i, close)
        i = xml.indexOf(s"<$tag>", close)
      }
      out.toSeq
    }
    val urls = blocks("url").map(b =>
      SitemapEntry("url", field(b, "loc"), field(b, "lastmod"),
        field(b, "priority")))
    val subs = blocks("sitemap").map(b =>
      SitemapEntry("sitemap", field(b, "loc"), field(b, "lastmod"), ""))
    (urls ++ subs).filter(_.loc.nonEmpty)
  }

  /** (doc_id, xml) → one row per entry: the frontier-seeding stage. */
  def sitemapEntries(docs: Dataset[(java.lang.Long, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap { case (boxed, xml) =>
      val id = boxed.longValue()
      parseSitemap(xml).iterator.map(e =>
        (id, e.kind, e.loc, e.lastmod, e.priority))
    }).toDF("doc_id", "kind", "loc", "lastmod", "priority")
  }

  /** Fixture: even ids are a urlset of 1+(id%3) urls (loc carries an
    * entity-encoded query string — the &amp; decode witness, plus
    * lastmod/priority in closed form); odd ids are a sitemapindex of
    * 2 child sitemaps.
    */
  def syntheticSitemaps(ids: Dataset[java.lang.Long])
      : Dataset[(java.lang.Long, String)] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val xml =
        if (id % 2 == 0) {
          val urls = (1 to (1 + id % 3).toInt).map { j =>
            f"""  <url>
               |    <loc>https://s$id.test/p$j?a=1&amp;b=2</loc>
               |    <lastmod>2024-${1 + id % 12}%02d-${1 + id % 28}%02d</lastmod>
               |    <priority>0.${1 + (id + j) % 9}</priority>
               |  </url>""".stripMargin
          }.mkString("\n")
          s"""<?xml version="1.0" encoding="UTF-8"?>
             |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
             |$urls
             |</urlset>""".stripMargin
        } else {
          val subs = (1 to 2).map(j =>
            s"  <sitemap>\n    <loc>https://s$id.test/sitemap$j.xml" +
              "</loc>\n  </sitemap>").mkString("\n")
          s"""<?xml version="1.0" encoding="UTF-8"?>
             |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
             |$subs
             |</sitemapindex>""".stripMargin
        }
      (boxed, xml)
    })
  }

  // ------------------------------------------------------------------
  // Spark stage + fixture twin
  // ------------------------------------------------------------------

  /** Gate a URL frontier against per-domain robots: parse each robots
    * body ONCE (the domain table is tiny by construction), broadcast
    * the parsed groups to the frontier, evaluate per row. Frontier
    * rows whose domain has no robots row are allowed (fetch-time
    * 404 semantics).
    */
  def gateByDomain(pages: DataFrame, robots: DataFrame, agent: String)
      : DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    // driver-side parse AND group selection per domain (agent is a
    // constant): the broadcast carries only each domain's governing
    // rule list, so the per-row work is exactly the matches() loop
    val ruleMap: Map[String, Seq[(Boolean, String)]] = robots
      .select("domain", "robots").as[(String, String)]
      .collect().iterator
      .map { case (d, t) => d -> rulesFor(parse(t), agent) }.toMap
    val bc = spark.sparkContext.broadcast(ruleMap)
    pages.select("doc_id", "domain", "path")
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, domain, path) =>
        val ok = bc.value.get(domain).forall(isAllowedByRules(_, path))
        (id, domain, path, ok)
      }).toDF("doc_id", "domain", "path", "allowed")
  }

  /** Fixture: one robots flavor per domain kind (domain-number % 3) —
    * 0: star group with Disallow /private/ + Allow /private/ok/ + an
    *    end-anchored star-.pdf Disallow;
    * 1: a graftbot-specific group (Disallow /nobot/) above a
    *    disallow-everything star group — group selection is the test;
    * 2: comments only — everything allowed.
    */
  private[graft] def robotsFor(kind: Long): String = kind match {
    case 0 =>
      """# standard gate
        |User-agent: *
        |Disallow: /private/
        |Allow: /private/ok/
        |Disallow: /*.pdf$
        |Crawl-delay: 2
        |""".stripMargin
    case 1 =>
      """User-agent: graftbot
        |Disallow: /nobot/
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    case _ =>
      """# no rules here
        |Sitemap: https://example.test/sitemap.xml
        |""".stripMargin
  }

  /** Frontier fixture: domain d(id%50).test, path by id%6 (normal /
    * disallowed / allow-override / anchored pdf / bot-specific /
    * query-after-pdf — the $ anchor must NOT match that one).
    */
  def syntheticFrontier(ids: Dataset[java.lang.Long])
      : (DataFrame, DataFrame) = {
    val spark = ids.sparkSession
    import spark.implicits._
    val pages = ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val path = (id % 6) match {
        case 0 => s"/a/b$id"
        case 1 => s"/private/x$id"
        case 2 => s"/private/ok/y$id"
        case 3 => s"/doc$id.pdf"
        case 4 => s"/nobot/z$id"
        case _ => s"/doc$id.pdf?x=1"
      }
      (id, s"d${id % 50}.test", path)
    }).toDF("doc_id", "domain", "path")
    val robots = spark.range(50).select(col("id"))
      .as[java.lang.Long].mapPartitions(_.map { boxed =>
        val k = boxed.longValue()
        (s"d$k.test", robotsFor(k % 3))
      }).toDF("domain", "robots")
    (pages, robots)
  }
}
