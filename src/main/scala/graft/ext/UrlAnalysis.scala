package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/domain analysis for corpus curation: host extraction, a
  * registered-domain heuristic, TLD, path depth, and domain blocklist
  * filtering — the domain-level signals every CC-derived pipeline
  * filters and stratifies on. Pure Column expressions (regexp + string
  * builtins, portable to the DuckDB oracle); no UDFs.
  *
  * The registered-domain heuristic is the last two labels (no public
  * suffix list — `a.co.uk` yields `co.uk`), which is what coarse
  * domain-level dedup/blocklists use when a PSL is unavailable.
  */
object UrlAnalysis {

  /** Group 1 = authority of an absolute URL; no match → "". */
  val HostRegex = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"

  /** Group 1 = path component (may be ""). */
  val PathRegex = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"

  def host(url: Column): Column = regexp_extract(url, HostRegex, 1)

  /** Pass a STAGED host column (it is referenced multiple times). */
  def registeredDomain(h: Column): Column = {
    val parts = split(h, "\\.")
    when(size(parts) >= 2,
      concat_ws(".", element_at(parts, -2), element_at(parts, -1)))
      .otherwise(h)
  }

  def tld(h: Column): Column = element_at(split(h, "\\."), -1)

  def pathDepth(url: Column): Column =
    size(filter(split(regexp_extract(url, PathRegex, 1), "/"),
      p => p =!= "")).cast("long")

  def hasQuery(url: Column): Column = url.contains("?")

  /** Keep rows whose registered domain is NOT blocklisted. The list is
    * a literal in the plan (blocklists are small); at real scale a
    * broadcast anti-join against a blocklist table is the same shape.
    */
  def notBlocked(h: Column, blocked: Seq[String]): Column =
    !registeredDomain(h).isin(blocked: _*)
}
