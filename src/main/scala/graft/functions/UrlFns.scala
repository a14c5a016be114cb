package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** URL analysis for the crawl family (sources/Warc → HtmlFns → here): the
  * per-URL primitives a crawl pipeline needs before any per-domain policy
  * can run — host extraction, registered-domain reduction (the public-
  * suffix rule, abbreviated to the common two-level suffixes), path depth,
  * and tracking-parameter stripping (the canonicalization step before URL
  * dedup). Compositions of codegen'd built-ins (regexp_extract /
  * regexp_replace) with adjacent DuckDB renderers, the HtmlFns discipline —
  * all regexes RE2-safe so both engines run identical patterns.
  *
  * Scale: pure map-side projections; per-domain aggregation downstream
  * shuffles on the registered domain — the policy key (source caps, crawl
  * budgets, robots grouping) — never on the raw URL.
  */
object UrlFns {

  private val hostRe = "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:\\[\\]]+)"
  /** Common two-level public suffixes (abbreviated PSL: the full list is a
    * data file, not logic — swap in the real one the same way).
    */
  private val sufRe2 = "([^.]+\\.(?:co|com|net|org|gov|ac|edu)\\.(?:uk|jp|au|nz|za|br|in))$"
  private val sufRe1 = "([^.]+\\.[^.]+)$"
  /** A host that IS a bare two-level public suffix — not a registered
    * domain of anything.
    */
  private val bareSufRe = "^(?:co|com|net|org|gov|ac|edu)\\.(?:uk|jp|au|nz|za|br|in)$"
  private val pathRe = "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
  /** Anchored to a parameter boundary: only an assignment whose NAME is a
    * tracking key matches — a parameter or value merely CONTAINING
    * "gclid=" (e.g. `?xgclid=5`, `?redirect=gclid=…`) is untouched.
    */
  private val trackRe = "([?&])(utm_[a-z]+|gclid|fbclid)=[^&#]*"

  /** Authority host, lowercased; userinfo and port stripped; empty string
    * for non-URLs (schemeless strings and IPv6 bracket literals are not
    * guessed at).
    */
  def host(c: Column): Column = regexp_extract(lower(c), hostRe, 1)

  def hostSql(c: String): String = s"regexp_extract(lower($c), '$hostRe', 1)"

  /** Registered domain of a [[host]]: the last two labels, or three when
    * the two-level suffix is one of the common country pairs (co.uk,
    * com.au, …). A bare TLD, a bare two-level suffix (a host "co.uk" is
    * nobody's registered domain), or an empty host yields the empty
    * string.
    */
  def registeredDomain(h: Column): Column =
    when(h.rlike(bareSufRe), lit(""))
      .when(regexp_extract(h, sufRe2, 1) =!= "", regexp_extract(h, sufRe2, 1))
      .otherwise(regexp_extract(h, sufRe1, 1))

  def registeredDomainSql(h: String): String =
    s"CASE WHEN regexp_matches($h, '$bareSufRe') THEN '' " +
    s"WHEN regexp_extract($h, '$sufRe2', 1) <> '' " +
    s"THEN regexp_extract($h, '$sufRe2', 1) " +
    s"ELSE regexp_extract($h, '$sufRe1', 1) END"

  /** Number of non-empty path segments (0 for no path or "/"). */
  def pathDepth(c: Column): Column =
    size(filter(split(regexp_extract(lower(c), pathRe, 1), "/"),
      x => x =!= "")).cast(LongType)

  def pathDepthSql(c: String): String =
    s"CAST(len(list_filter(string_split(regexp_extract(lower($c), '$pathRe', 1), '/'), " +
    s"x -> x <> '')) AS BIGINT)"

  /** Canonicalize away tracking parameters (utm_*, gclid, fbclid): each
    * boundary-anchored assignment is removed (its leading separator kept),
    * then dangling separators repaired — `?&` runs, `&&` runs, a `?`/`&`
    * run left hanging before a `#fragment`, and a trailing run. Chained
    * global regexp_replace on both engines, identical patterns (only the
    * backreference syntax differs: `$1` Spark, `\\1` DuckDB).
    */
  def stripTracking(c: Column): Column = {
    val r1 = regexp_replace(c, trackRe, "$1")
    val r2 = regexp_replace(r1, "\\?&+", "?")
    val r3 = regexp_replace(r2, "&&+", "&")
    val r4 = regexp_replace(r3, "[?&]+#", "#")
    regexp_replace(r4, "[?&]+$", "")
  }

  def stripTrackingSql(c: String): String = {
    val r1 = s"regexp_replace($c, '$trackRe', '\\1', 'g')"
    val r2 = s"regexp_replace($r1, '\\?&+', '?', 'g')"
    val r3 = s"regexp_replace($r2, '&&+', '&', 'g')"
    val r4 = s"regexp_replace($r3, '[?&]+#', '#', 'g')"
    s"regexp_replace($r4, '[?&]+$$', '', 'g')"
  }

  // ----- robots.txt evaluation (RFC 9309 longest-match) -----------------
  //
  // The crawl-politeness primitive: given a path and the applicable
  // user-agent section's body, a URL is fetchable when no Disallow prefix
  // matches, or when an Allow prefix AT LEAST AS LONG as the longest
  // matching Disallow overrides it (the RFC/Google tie rule: Allow wins on
  // equal length). Empty `Disallow:` lines (the allow-all idiom) are
  // dropped at parse time. Multi-agent bodies should be pre-filtered to
  // the applicable section; the fixture uses single '*' sections.
  // Pure map-side HOF compositions — the robots body rides the domain
  // policy table (one row per domain, broadcast-joined onto the frontier
  // at scale), never a per-URL fetch.

  /** Non-empty prefix values of one directive kind ("Disallow"/"Allow").
    * Real robots.txt files are frequently CRLF — each line's trailing \r is
    * stripped before the value is taken, so a CRLF file parses identically
    * to its LF twin (spec-pinned in UrlFnsSpec).
    */
  def robotsPrefixes(robots: Column, directive: String): Column = {
    val tag = directive + ":"
    filter(
      transform(
        filter(split(robots, "\n"), l => l.startsWith(tag)),
        l => trim(regexp_replace(substring(l, tag.length + 1, 1 << 20),
          "\r$", ""))),
      p => p =!= "")
  }

  def robotsPrefixesSql(robots: String, directive: String): String =
    s"list_filter(list_transform(list_filter(string_split($robots, chr(10)), " +
    s"l -> starts_with(l, '$directive:')), " +
    s"l -> trim(regexp_replace(substring(l, ${directive.length + 2}, ${1 << 20}), " +
    s"chr(13) || '$$', ''))), p -> p <> '')"

  /** Length of the longest prefix in `prefixes` that matches `path`
    * (NULL when none matches) — the RFC 9309 specificity measure.
    */
  def robotsMatchLen(path: Column, prefixes: Column): Column =
    array_max(transform(
      filter(prefixes, p => path.startsWith(p)), p => length(p))).cast(LongType)

  def robotsMatchLenSql(path: String, prefixes: String): String =
    s"CAST(list_max(list_transform(list_filter($prefixes, " +
    s"p -> starts_with($path, p)), p -> length(p))) AS BIGINT)"

  /** Fetchability of `path` against ALREADY-PARSED Disallow/Allow prefix
    * arrays — the scale form of [[robotsAllowed]]: a crawl frontier carries
    * billions of URLs but only one robots body per domain, so the parse
    * (split + regex per directive) belongs on a distinct (domain, robots)
    * table joined broadcast, not in the per-URL row pipeline. Only the
    * prefix match (a startsWith scan over a handful of prefixes) runs per
    * URL.
    */
  def robotsAllowedPre(path: Column, disallow: Column, allow: Column): Column = {
    val dmax = robotsMatchLen(path, disallow)
    val amax = robotsMatchLen(path, allow)
    when(dmax.isNull, lit(true)).otherwise(coalesce(amax, lit(-1L)) >= dmax)
  }

  /** Fetchability of `path` under a robots section body (parses per row —
    * prefer [[robotsAllowedPre]] over a per-domain rule table at scale).
    */
  def robotsAllowed(path: Column, robots: Column): Column =
    robotsAllowedPre(path, robotsPrefixes(robots, "Disallow"),
      robotsPrefixes(robots, "Allow"))
}
