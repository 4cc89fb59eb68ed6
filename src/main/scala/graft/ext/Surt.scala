package graft.ext

/** SURT (Sort-friendly URI Reordering Transform) canonicalization —
  * the key scheme of every public web-archive index (the cc-index
  * table's `url_surtkey` column, CDX/CDXJ file ordering, pywb/
  * OpenWayback lookup). Reversing the host puts all of a registered
  * domain's URLs in one contiguous key range, which is what makes a
  * sorted index seekable by domain.
  *
  * Implemented subset (the cc-index `url_surtkey` conventions):
  * lowercase everything; drop the scheme and userinfo; strip one
  * leading `www.` / `www<digits>.` host label; reverse the remaining
  * host labels comma-joined; keep a non-default port after a colon —
  * the default is the SCHEME's own (`:80` drops only for http, `:443`
  * only for https; `http://host:443` keeps its port, matching the
  * canonical SURT implementations and therefore real cc-index
  * `url_surtkey` values — schemeless input assumes http, the classic
  * surt-library convention); `)` then the path (`/` when empty);
  * query kept after `?` with parameters sorted bytewise (the
  * canonical order that makes equal-query URLs key-equal); fragments
  * drop.
  */
object Surt {

  /** URL corpus rotating every canonicalization rule (scheme by %2,
    * www label by %3, port keep/drop by %5 — id%5==1 puts `:443` on
    * BOTH schemes, so the scheme-aware default-port rule is witnessed
    * in each direction (drops on https, KEPT on http) — path case,
    * query order by %4, fragment by %7; ids %10==3 are bracketed-IPv6
    * authorities rotating http+:8443 (kept) / https+:443 (dropped),
    * and %10==7 dotted-quad IPv4 rotating portless-https /
    * http+:80 (dropped) — the IP-literal no-reverse rules plus the
    * port rule on literals) → (doc_id, url, surt_key). Lives HERE,
    * not in the query registry: a lambda defined inside the registry
    * object drags that object's static init onto executor JVMs (the
    * local-cluster battery catches exactly this).
    */
  def syntheticUrlKeys(
      ids: org.apache.spark.sql.Dataset[java.lang.Long])
      : org.apache.spark.sql.DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
      val url =
        if (id % 10 == 3) {
          // uppercase hex + the default/explicit port rotation on a
          // bracketed literal — lastIndexOf(':') would mis-split these.
          // Inner rotation steps by id/10: id%2 is CONSTANT (odd)
          // inside the %10==3 residue class (the fixture-modulus rule).
          // The scheme rides the rotation so :443 pairs with ITS
          // default scheme (drops) while :8443 stays non-default (kept)
          if ((id / 10) % 2 == 0)
            s"http://[2001:DB8::${id % 9}]:8443/v6/item${id % 7}"
          else
            s"https://[2001:DB8::${id % 9}]:443/v6/item${id % 7}"
        } else if (id % 10 == 7) {
          // dotted-quad family rotates the http:80 default-drop witness
          if ((id / 10) % 2 == 0)
            s"https://192.168.${id % 20}.1/v4/item${id % 7}"
          else
            s"http://192.168.${id % 20}.1:80/v4/item${id % 7}"
        } else {
          val scheme = if (id % 2 == 0) "https" else "http"
          val host = (if (id % 3 == 0) "www." else "") +
            s"site${id % 20}.example"
          val port =
            if (id % 5 == 0) ":8080"
            else if (id % 5 == 1) ":443" else ""
          val path = s"/Path${id % 7}/item"
          val query =
            if (id % 4 == 0) s"?b=2&a=${id % 9}"
            else if (id % 4 == 1) "?z=1" else ""
          val frag = if (id % 7 == 0) "#frag" else ""
          s"$scheme://$host$port$path$query$frag"
        }
      (id, url, surtKey(url))
    }).toDF("doc_id", "url", "surt_key")
  }

  def surtKey(url: String): String = {
    val u = url.trim.toLowerCase(java.util.Locale.ROOT)
    // strip fragment first — never part of the key
    val noFrag = {
      val h = u.indexOf('#')
      if (h >= 0) u.substring(0, h) else u
    }
    val (scheme, afterScheme) = {
      val i = noFrag.indexOf("://")
      if (i >= 0) (noFrag.substring(0, i), noFrag.substring(i + 3))
      else ("http", noFrag) // schemeless assumes http (surt convention)
    }
    val afterUser = {
      val q = afterScheme.indexOf('?')
      val slash = afterScheme.indexOf('/')
      val at = afterScheme.indexOf('@')
      // an @ only counts as userinfo when it sits before the path and
      // the query
      val authEnd = Seq(slash, q).filter(_ >= 0).sorted.headOption
        .getOrElse(afterScheme.length)
      if (at >= 0 && at < authEnd) afterScheme.substring(at + 1)
      else afterScheme
    }
    val pathStart = afterUser.indexWhere(c => c == '/' || c == '?')
    val (auth, rest) =
      if (pathStart < 0) (afterUser, "")
      else (afterUser.substring(0, pathStart), afterUser.substring(pathStart))
    // only the scheme's OWN default drops: http://host:443 is a
    // non-default port and must key differently from http://host —
    // real cc-index url_surtkey values follow this rule, and a
    // lookupPrefix against a real cluster.idx would miss otherwise
    def portOf(p: String): String =
      if (p.nonEmpty && p.forall(c => c >= '0' && c <= '9'))
        if ((p == "80" && scheme == "http") ||
            (p == "443" && scheme == "https")) ""
        else ":" + p
      else ""
    val (host, port) = {
      if (auth.startsWith("[")) {
        // bracketed IPv6 literal: the host is everything through `]`;
        // a naive lastIndexOf(':') would land mid-address on a
        // portless `[2001:db8::1]` — split on the bracket instead
        val close = auth.indexOf(']')
        if (close < 0) (auth, "") // malformed: keep whole, fail closed
        else {
          val h = auth.substring(0, close + 1)
          val rest = auth.substring(close + 1)
          if (rest.startsWith(":")) (h, portOf(rest.substring(1)))
          else (h, "")
        }
      } else {
        val c = auth.lastIndexOf(':')
        if (c < 0) (auth, "")
        else {
          val p = portOf(auth.substring(c + 1))
          if (p.nonEmpty ||
              auth.substring(c + 1).forall(x => x >= '0' && x <= '9'))
            (auth.substring(0, c), p)
          else (auth, "")
        }
      }
    }
    val labels = host.split('.').filter(_.nonEmpty)
    val trimmed =
      if (labels.length > 2 && labels.head.matches("www\\d*")) labels.tail
      else labels
    // IP literals keep their written form (the cc-index convention —
    // the surt reversal exists to group a registered domain's labels,
    // which an address has none of): bracketed IPv6 stays whole,
    // dotted-quad IPv4 stays unreversed
    val isIpv6 = host.startsWith("[")
    val isIpv4 = labels.length == 4 &&
      labels.forall(l => l.nonEmpty && l.length <= 3 &&
        l.forall(c => c >= '0' && c <= '9'))
    val revHost =
      if (isIpv6) host
      else if (isIpv4) labels.mkString(".")
      else trimmed.reverse.mkString(",")
    // split path / query; sort query params bytewise
    val (path, query) = {
      val q = rest.indexOf('?')
      if (q < 0) (rest, "")
      else (rest.substring(0, q), rest.substring(q + 1))
    }
    val canonPath = if (path.isEmpty) "/" else path
    val canonQuery =
      if (query.isEmpty) ""
      else "?" + query.split('&').filter(_.nonEmpty).sorted.mkString("&")
    s"$revHost$port)$canonPath$canonQuery"
  }
}
