package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** robots.txt parsing + politeness gating (RFC 9309) — the crawl-side
  * admission filter a URL frontier runs before fetching: group
  * selection by most-specific product token, longest-match rule
  * precedence with allow-on-tie, `*` wildcards and the `$` end
  * anchor.
  *
  * Scale shape: robots documents are PER DOMAIN (a small table next
  * to a huge URL frontier), so the gate parses each robots ONCE — on
  * EXECUTORS, never the driver: at CC scale the robots table is
  * 10⁷–10⁸ domains and a driver-side collect/parse would OOM the
  * driver and serialize the parse. [[rulesByDomain]] parses + selects
  * the governing rule list per domain in `mapPartitions`; the gate
  * then joins frontier → rules (broadcast under a domain-count
  * threshold, a domain-keyed equi-join above it) and runs only the
  * per-row `matches()` loop on frontier rows ([[gateByDomain]]).
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

  /** The groups governing `agent`: the LONGEST matching product token
    * wins (token a prefix of the agent, case-insensitive); all groups
    * carrying that token combine; `*` groups are the fallback.
    */
  private def selectGroups(groups: Seq[Group], agent: String): Seq[Group] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    val tokens = groups.flatMap(_.agents).distinct
      .filter(t => t != "*" && a.startsWith(t))
    val chosen =
      if (tokens.nonEmpty) tokens.maxBy(_.length)
      else "*"
    groups.filter(_.agents.contains(chosen))
  }

  /** The rules governing `agent` (see [[selectGroups]]). */
  def rulesFor(groups: Seq[Group], agent: String): Seq[(Boolean, String)] =
    selectGroups(groups, agent).flatMap(_.rules)

  /** The crawl delay governing `agent`: the first defined Crawl-delay
    * among its selected groups (file order), the value a politeness
    * scheduler paces per-domain fetches by.
    */
  def crawlDelayFor(groups: Seq[Group], agent: String): Option[Double] =
    selectGroups(groups, agent).flatMap(_.crawlDelaySec).headOption

  /** Sitemap URLs declared in a robots.txt — the `Sitemap:` directive
    * is GROUP-INDEPENDENT (sitemaps.org / RFC 9309 §2.3's "other
    * records"), so it is extracted from the whole file, in order,
    * comments stripped. The discovery seed [[parseSitemap]] consumes.
    */
  def sitemapUrls(txt: String): Seq[String] =
    txt.linesIterator.flatMap { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw
        case h => raw.substring(0, h)
      }
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim
          .equalsIgnoreCase("sitemap")) {
        // the URL's own "https:" colon sits AFTER the directive colon
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }.toSeq

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
    * entity-decoded (URLs carry `&amp;`) unless it sits in a CDATA
    * section (taken verbatim, per XML). Member tags may carry
    * namespace prefixes (`<sm:loc>`) and attributes — both routine in
    * crawled sitemaps ([[XmlScan]]). Tag scan, not an XML parser —
    * hostile input yields fewer entries, never a throw.
    */
  def parseSitemap(xml: String): Seq[SitemapEntry] = {
    import XmlScan.field
    def blocks(local: String): Seq[String] = XmlScan.blocks(xml, local)
    val urls = blocks("url").map(b =>
      SitemapEntry("url", field(b, "loc"), field(b, "lastmod"),
        field(b, "priority")))
    val subs = blocks("sitemap").map(b =>
      SitemapEntry("sitemap", field(b, "loc"), field(b, "lastmod"), ""))
    (urls ++ subs).filter(_.loc.nonEmpty)
  }

  /** Sitemap bodies as fetched: gzip-compressed `sitemap.xml.gz` is
    * explicitly allowed by the protocol, so gunzip on the 1f 8b magic
    * (output capped — a decompression bomb fails closed to empty),
    * charset-sniff ([[Charsets.decode]] — sitemaps are UTF-8, often
    * BOM'd), then [[parseSitemap]].
    */
  def parseSitemapBytes(b: Array[Byte]): Seq[SitemapEntry] =
    Gunzip.capped(b, 1 << 26) match { // 64 MiB decompressed ceiling
      case Some(xml) => parseSitemap(Charsets.decode(xml)._1)
      case None => Seq.empty
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

  /** Bytes-as-fetched variant ((doc_id, bytes) → entries): gunzip +
    * charset-sniff + parse per row ([[parseSitemapBytes]]) — the shape
    * a fetch stage actually hands over (`sitemap.xml.gz` is protocol-
    * legal and common).
    */
  def sitemapEntriesRaw(docs: Dataset[(java.lang.Long, Array[Byte])])
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions(_.flatMap { case (boxed, bytes) =>
      val id = boxed.longValue()
      parseSitemapBytes(bytes).iterator.map(e =>
        (id, e.kind, e.loc, e.lastmod, e.priority))
    }).toDF("doc_id", "kind", "loc", "lastmod", "priority")
  }

  /** Fixture: even ids are a urlset of 1+(id%3) urls (loc carries an
    * entity-encoded query string — the &amp; decode witness, plus
    * lastmod/priority in closed form); odd ids are a sitemapindex of
    * 2 child sitemaps. Ids ≡ 0 (mod 4) emit the REALISTIC long tail —
    * namespace-prefixed member tags carrying attributes, the loc in a
    * CDATA section (raw '&', no entity) — and must parse to the SAME
    * entries (one oracle covers both shapes).
    */
  def syntheticSitemaps(ids: Dataset[java.lang.Long])
      : Dataset[(java.lang.Long, String)] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val xml =
        if (id % 4 == 0) {
          val urls = (1 to (1 + id % 3).toInt).map { j =>
            f"""  <sm:url data-src="crawler">
               |    <sm:loc><![CDATA[https://s$id.test/p$j?a=1&b=2]]></sm:loc>
               |    <sm:lastmod>2024-${1 + id % 12}%02d-${1 + id % 28}%02d</sm:lastmod>
               |    <sm:priority>0.${1 + (id + j) % 9}</sm:priority>
               |  </sm:url>""".stripMargin
          }.mkString("\n")
          s"""<?xml version="1.0" encoding="UTF-8"?>
             |<sm:urlset xmlns:sm="http://www.sitemaps.org/schemas/sitemap/0.9">
             |$urls
             |</sm:urlset>""".stripMargin
        } else if (id % 2 == 0) {
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

  /** One selected rule as a column-able struct. */
  final case class Rule(allow: Boolean, pattern: String)

  /** Executor-side robots parse + group selection (agent is a
    * constant): (domain, robots) → (domain, rules, crawl_delay_sec)
    * with ONLY the governing rule list kept per domain — the frame
    * the gate joins, sized by rules actually in force, not by raw
    * robots bodies. Pure `mapPartitions`: no driver state, no
    * shuffle, scales to a 10⁸-domain robots table.
    */
  def rulesByDomain(robots: DataFrame, agent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select("domain", "robots").as[(String, String)]
      .mapPartitions(_.map { case (d, txt) =>
        val groups = parse(txt)
        val rules = rulesFor(groups, agent)
          .map { case (allow, pat) => Rule(allow, pat) }
        (d, rules, crawlDelayFor(groups, agent))
      }).toDF("domain", "rules", "crawl_delay_sec")
  }

  /** Gate a URL frontier against per-domain robots: parse on
    * EXECUTORS ([[rulesByDomain]]), join rules to the frontier by
    * domain, evaluate the per-row `matches()` loop. Output adds
    * `allowed` and the governing group's `crawl_delay_sec` (the
    * politeness scheduler's pacing input). Frontier rows whose domain
    * has no robots row are allowed (fetch-time 404 semantics) with a
    * null delay.
    *
    * Join shape: the rules frame BROADCASTS when the robots table is
    * small (one cheap count of the SMALL side decides — ≤
    * `maxBroadcastDomains`, sized so the broadcast stays ~100 MB at
    * typical rule lists), else a domain-keyed equi-join — the
    * frontier shuffles once on domain, never collects, and AQE's
    * skew handling covers hot domains. A caller that already knows
    * the shape pins it WITHOUT the counting pass: threshold 0 forces
    * the equi-join, `Long.MaxValue` forces broadcast.
    */
  def gateByDomain(pages: DataFrame, robots: DataFrame, agent: String,
      maxBroadcastDomains: Long = 1000000L): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.broadcast
    val rules = rulesByDomain(robots, agent)
    val useBroadcast =
      if (maxBroadcastDomains <= 0L) false
      else if (maxBroadcastDomains == Long.MaxValue) true
      else robots.count() <= maxBroadcastDomains
    val rulesSide = if (useBroadcast) broadcast(rules) else rules
    pages.select("doc_id", "domain", "path")
      .join(rulesSide, Seq("domain"), "left")
      .select("doc_id", "domain", "path", "rules", "crawl_delay_sec")
      .as[(Long, String, String, Option[Seq[Rule]], Option[Double])]
      .mapPartitions(_.map { case (id, domain, path, rs, delay) =>
        val ok = rs.forall(seq =>
          isAllowedByRules(seq.map(r => (r.allow, r.pattern)), path))
        (id, domain, path, ok, delay)
      }).toDF("doc_id", "domain", "path", "allowed", "crawl_delay_sec")
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
        |Sitemap: https://maps.example.test/a.xml
        |Sitemap: https://maps.example.test/b.xml
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

  /** (domain, robots) → one row per declared sitemap URL: the
    * robots-side discovery stage (per-row [[sitemapUrls]] — zero
    * shuffle), whose output feeds [[sitemapEntriesRaw]] after fetch.
    */
  def sitemapsByDomain(robots: DataFrame): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots.select("domain", "robots").as[(String, String)]
      .mapPartitions(_.flatMap { case (d, txt) =>
        sitemapUrls(txt).iterator.map(u => (d, u))
      }).toDF("domain", "sitemap")
  }

  // ------------------------------------------------------------------
  // discovery → admission composition fixtures (q_frontier_pipeline):
  // sitemap bytes as fetched → entries → URL split → robots gate
  // ------------------------------------------------------------------

  /** One sitemap FILE per id for domain f<id>.test: a urlset of
    * 1+(id%3) urls `/p<j>?a=1&b=2`; odd ids arrive GZIPPED (the
    * `sitemap.xml.gz` path), ids ≡ 0 (mod 4) in the namespaced/CDATA
    * shape — so the pipeline witnesses gunzip, prefix tolerance, and
    * entity decode in one oracled flow.
    */
  def syntheticFrontierSitemaps(ids: Dataset[java.lang.Long])
      : Dataset[(java.lang.Long, Array[Byte])] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val urls = (1 to (1 + id % 3).toInt).map { j =>
        if (id % 4 == 0)
          s"  <sm:url rate=\"1\"><sm:loc><![CDATA[" +
            s"https://f$id.test/p$j?a=1&b=2]]></sm:loc></sm:url>"
        else s"  <url><loc>https://f$id.test/p$j?a=1&amp;b=2</loc></url>"
      }.mkString("\n")
      val xml =
        if (id % 4 == 0)
          "<sm:urlset xmlns:sm=\"http://www.sitemaps.org/schemas/" +
            s"sitemap/0.9\">\n$urls\n</sm:urlset>"
        else
          "<urlset xmlns=\"http://www.sitemaps.org/schemas/" +
            s"sitemap/0.9\">\n$urls\n</urlset>"
      val bytes =
        if (id % 2 == 1) {
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write(xml.getBytes("UTF-8"))
          gz.close()
          bos.toByteArray
        } else xml.getBytes("UTF-8")
      (boxed, bytes)
    })
  }

  /** Per-domain robots for the frontier-pipeline fixture, by id % 4 —
    *  0: star group Disallow /p1 + Crawl-delay 1.5 (blocks j=1, paces);
    *  1: an EMPTY Disallow (dropped at parse — allow everything);
    *  2: a graftbot group (Disallow /p2) above a disallow-all star
    *     group — group selection must pick the specific one;
    *  3: NO robots row at all (fetch-time 404 → allowed, null delay —
    *     the left-join miss path).
    */
  def syntheticFrontierRobots(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.flatMap { boxed =>
      val id = boxed.longValue()
      val body = (id % 4) match {
        case 0 => "User-agent: *\nDisallow: /p1\nCrawl-delay: 1.5\n"
        case 1 => "User-agent: *\nDisallow:\n"
        case 2 => "User-agent: graftbot\nDisallow: /p2\n\n" +
          "User-agent: *\nDisallow: /\n"
        case _ => ""
      }
      if (id % 4 == 3) Iterator.empty
      else Iterator.single((s"f$id.test", body))
    }).toDF("domain", "robots")
  }

  /** Robots rows for the FEED channel's domains (`n<id>.test`, see
    * [[Feeds.syntheticFeeds]]): id%4 == 0 blocks /post1 with a 2 s
    * delay, 1's graftbot group blocks /e2, 2 allows everything, 3 has
    * NO row (the left-join miss path: allowed, null delay) — the same
    * admission shapes the sitemap channel oracles, over the feed
    * corpus.
    */
  def syntheticFeedRobots(ids: Dataset[java.lang.Long]): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.flatMap { boxed =>
      val id = boxed.longValue()
      val body = (id % 4) match {
        case 0 => "User-agent: *\nDisallow: /post1\nCrawl-delay: 2\n"
        case 1 => "User-agent: graftbot\nDisallow: /e2\n\n" +
          "User-agent: *\nDisallow: /\n"
        case 2 => "User-agent: *\nDisallow:\n"
        case _ => ""
      }
      if (id % 4 == 3) Iterator.empty
      else Iterator.single((s"n$id.test", body))
    }).toDF("domain", "robots")
  }
}
