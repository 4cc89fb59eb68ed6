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
  * host labels comma-joined; keep a non-default port after a colon
  * (`:80`/`:443` drop); `)` then the path (`/` when empty); query
  * kept after `?` with parameters sorted bytewise (the canonical
  * order that makes equal-query URLs key-equal); fragments drop.
  */
object Surt {

  /** URL corpus rotating every canonicalization rule (scheme by %2,
    * www label by %3, port keep/drop by %5, path case, query order by
    * %4, fragment by %7) → (doc_id, url, surt_key). Lives HERE, not in
    * the query registry: a lambda defined inside the registry object
    * drags that object's static init onto executor JVMs (the
    * local-cluster battery catches exactly this).
    */
  def syntheticUrlKeys(
      ids: org.apache.spark.sql.Dataset[java.lang.Long])
      : org.apache.spark.sql.DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.mapPartitions(_.map { boxed =>
      val id = boxed.longValue()
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
      val url = s"$scheme://$host$port$path$query$frag"
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
    val afterScheme = {
      val i = noFrag.indexOf("://")
      if (i >= 0) noFrag.substring(i + 3) else noFrag
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
    val (host, port) = {
      val c = auth.lastIndexOf(':')
      if (c < 0) (auth, "")
      else {
        val p = auth.substring(c + 1)
        if (p.nonEmpty && p.forall(_.isDigit))
          (auth.substring(0, c), if (p == "80" || p == "443") "" else ":" + p)
        else (auth, "")
      }
    }
    val labels = host.split('.').filter(_.nonEmpty)
    val trimmed =
      if (labels.length > 2 && labels.head.matches("www\\d*")) labels.tail
      else labels
    val revHost = trimmed.reverse.mkString(",")
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
