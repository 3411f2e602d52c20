package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the normalization step
  * every large crawl pipeline runs before URL-level dedup (public
  * precedents: CCNet / RefinedWeb dedupe by normalized URL; the reference
  * has no web surface, this extends the curation family). Pure Column
  * logic — regexp splits + array ops, fully codegen'd, no UDF, no
  * shuffle; at 100 TB this is a free map stage ahead of an exact
  * groupBy(canonical) dedup.
  *
  * Canonical form (documented, deterministic):
  *   - scheme lower-cased; missing scheme → "http"
  *   - userinfo ("user:pass@") dropped — credentials are not page
  *     identity, and leaving them in would split one page across keys
  *   - host lower-cased, one leading "www." stripped (IPv6 bracket
  *     literals are out of scope — crawl URL lists are hostname-based)
  *   - default ports dropped (":80" for http, ":443" for https); other
  *     ports kept
  *   - path: trailing "/" runs stripped (non-root); empty path → "/";
  *     case PRESERVED (paths are case-sensitive, hosts are not)
  *   - query: tracking params dropped case-insensitively (utm_*, fbclid,
  *     gclid, msclkid, igshid, ref, ref_src — "UTM_Source=" is as much a
  *     tracker as "utm_source="), the rest SORTED by "k=v" string,
  *     rejoined; empty result drops the "?"
  *   - fragment dropped
  */
object UrlOps {

  private val TrackingRe =
    "(?i)^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|igshid|ref|ref_src)="

  // Userinfo lives only in the authority (before the first "/"), so it is
  // stripped from the extracted host:port, never from the path — an "@"
  // inside a path segment is untouched.
  private def dropUserinfo(hostPort: Column): Column =
    regexp_replace(hostPort, "^[^/@]*@", "")

  /** The canonical URL per the object doc's rules. */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(trim(u), "#.*$", "")
    val hasScheme = noFrag.rlike("^[A-Za-z][A-Za-z0-9+.-]*://")
    val scheme = when(hasScheme,
      lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .otherwise(lit("http"))
    val rest = when(hasScheme,
      regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", ""))
      .otherwise(noFrag)
    val hostPort = dropUserinfo(regexp_extract(rest, "^([^/?]+)", 1))
    val host = regexp_replace(
      lower(regexp_extract(hostPort, "^([^:]+)", 1)), "^www\\.", "")
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val pathq = regexp_extract(rest, "^[^/?]*(.*)$", 1)
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(regexp_replace(path0, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(path0, "/+$", ""))
    val query0 = regexp_extract(pathq, "\\?(.*)$", 1)
    val params = filter(split(query0, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))
    val qstr = concat_ws("&", array_sort(params))
    concat(scheme, lit("://"), host, portPart, path,
      when(qstr === "", lit("")).otherwise(concat(lit("?"), qstr)))
  }

  /** The canonical host alone (lower-cased, "www." stripped) — the
    * grouping key for domain-level mix statistics and per-site quotas.
    */
  def urlHost(u: Column): Column = {
    val noFrag = regexp_replace(trim(u), "#.*$", "")
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    regexp_replace(
      lower(regexp_extract(
        dropUserinfo(regexp_extract(rest, "^([^/?]+)", 1)),
        "^([^:]+)", 1)),
      "^www\\.", "")
  }
}
