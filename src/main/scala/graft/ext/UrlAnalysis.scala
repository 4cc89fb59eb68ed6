package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Per-registered-domain cap — the CC-curation staple that stops one
    * prolific host from dominating a corpus: keep at most `k` rows per
    * registered domain, chosen in deterministic salted-hash order over
    * `idCol` (reproducible across runs/engines, no RNG state; `idCol`
    * breaks hash ties totally). Adds `reg_domain` and `rk` (1-based
    * keep rank).
    *
    * Scale design: the rank filter sits ADJACENT to its window, so the
    * optimizer plans a WindowGroupLimit — each map task prunes to its
    * local top-k per domain BEFORE the shuffle, which is what keeps a
    * hot domain (10^8 pages of one site) from landing its whole group
    * in a single window partition. TopKGroupLimitSpec freezes this.
    */
  def capPerDomain(df: DataFrame, urlCol: String, idCol: String, k: Int,
      salt: String = "dom"): DataFrame = {
    require(!Seq("__host", "reg_domain", "rk").exists(df.columns.contains),
      "capPerDomain writes __host/reg_domain/rk — input must not carry them")
    val staged = df
      .withColumn("__host", host(col(urlCol)))
      .withColumn("reg_domain", registeredDomain(col("__host")))
      .drop("__host")
    val w = Window.partitionBy("reg_domain").orderBy(
      graft.functions.Hashing.h32(
        concat(lit(salt + "|"), col(idCol).cast("string"))),
      col(idCol))
    staged
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }

  // --- canonicalization ---

  /** Query-parameter prefixes that never identify content: analytics
    * campaign tags and click ids. Matched against `name=` at the start
    * of each parameter.
    */
  val TrackingParamRegex = "^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid|ref)="

  /** Group 1 = "?query" (with the '?'), "" when absent. Fragment never
    * captured. */
  val QueryRegex = "^[^?#]*\\?([^#]*)"

  /** Canonical form of an absolute http(s) URL — the dedup key that
    * collapses the crawl-side noise that makes one page look like many:
    *
    *  - scheme and host lowercased,
    *  - explicit default port dropped (`:80` for http, `:443` https),
    *  - fragment dropped (never sent to the server),
    *  - tracking parameters dropped ([[TrackingParamRegex]]),
    *  - surviving query parameters SORTED (param order is
    *    server-irrelevant but crawler-visible),
    *  - empty path normalized to "/".
    *
    * Pure Column expressions end to end — per-row, no shuffle, pushes
    * through whole-stage codegen; canonical-key dedup is then one hash
    * aggregation. URL-decoding equivalence (%41 vs A) is deliberately
    * out of scope: decoding reserved characters changes semantics, so
    * canonicalizers that normalize percent-encoding do it tablewise —
    * a different, riskier trade.
    *
    * Expects a STAGED url column (referenced several times).
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val h0 = lower(host(url))
    val h = when(scheme === "http" && h0.endsWith(":80"),
        h0.substr(lit(1), length(h0) - 3))
      .when(scheme === "https" && h0.endsWith(":443"),
        h0.substr(lit(1), length(h0) - 4))
      .otherwise(h0)
    val path = regexp_extract(url, PathRegex, 1)
    val normPath = when(path === "", lit("/")).otherwise(path)
    val query = regexp_extract(url, QueryRegex, 1)
    val keptParams = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRegex)))
    val normQuery = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), h, normPath, normQuery)
  }
}
