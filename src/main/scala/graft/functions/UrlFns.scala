package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable URL canonicalization — the crawl-pipeline step that runs
  * BEFORE any text-level dedup: Common-Crawl-scale corpora dedupe by
  * canonical URL first (it is free relative to MinHash), and a naive
  * string key misses the same page behind case, default-port,
  * fragment, and query-order variation.
  *
  * Canonical form produced (each rule a plain regexp/array built-in —
  * narrow, codegen'd, zero shuffles; the *Sql mirror builds the
  * IDENTICAL DuckDB expression so URL keys are bit-exact cross-engine):
  *  - scheme and host lowercased (path/query case is significant and
  *    preserved);
  *  - default ports stripped — :80 for http, :443 for https;
  *  - fragment dropped (client-side only, never reaches the server);
  *  - query split on '&', empty params dropped, params SORTED
  *    bytewise and re-joined; the '?' is dropped when nothing
  *    survives;
  *  - trailing slashes on the path stripped (the root path becomes
  *    empty, so `http://h/` ≡ `http://h`).
  *
  * Non-goals (documented, not silently wrong): no percent-decoding
  * (decoding can CHANGE the resource for reserved chars), no
  * `www.`-stripping or tracking-param removal (site-policy, not
  * protocol — callers compose their own `regexp_replace` for those).
  */
object UrlFns {
  private val Scheme = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val Host = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
  private val Rest = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)"

  def canonicalizeUrl(u: Column): Column = {
    val scheme = lower(regexp_extract(u, Scheme, 1))
    val host = lower(regexp_extract(u, Host, 1))
    val hostNoPort = when(scheme === "http", regexp_replace(host, ":80$", ""))
      .when(scheme === "https", regexp_replace(host, ":443$", ""))
      .otherwise(host)
    val rest = regexp_extract(u, Rest, 1) // path + query, fragment gone
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val sortedQ = array_join(
      array_sort(filter(split(query, "&"), x => x =!= lit(""))), "&")
    concat(scheme, lit("://"), hostNoPort, path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Canonical host of a URL (lowercased, default port stripped) —
    * the aggregation key for domain-level curation (host reputation,
    * per-domain quotas). */
  def hostOf(u: Column): Column =
    regexp_extract(canonicalizeUrl(u), Host, 1)

  def hostOfSql(x: String): String =
    s"regexp_extract(${canonicalizeUrlSql(x)}, '$Host', 1)"

  /** DuckDB mirror of [[canonicalizeUrl]] over the SQL expression `x`
    * (list_filter/list_sort/array_to_string ≡ filter/array_sort/
    * array_join; both engines compare strings bytewise).
    */
  def canonicalizeUrlSql(x: String): String = {
    val scheme = s"lower(regexp_extract($x, '$Scheme', 1))"
    val host = s"lower(regexp_extract($x, '$Host', 1))"
    val hostNoPort =
      s"""CASE WHEN $scheme = 'http'
         |  THEN regexp_replace($host, ':80$$', '')
         |WHEN $scheme = 'https'
         |  THEN regexp_replace($host, ':443$$', '')
         |ELSE $host END""".stripMargin
    val rest = s"regexp_extract($x, '$Rest', 1)"
    val path =
      s"regexp_replace(regexp_extract($rest, '^([^?]*)', 1), '/+$$', '')"
    val query = s"regexp_extract($rest, '\\?(.*)$$', 1)"
    val sortedQ = s"""array_to_string(list_sort(
       | list_filter(string_split($query, '&'), p -> p != '')), '&')""".stripMargin
    s"""($scheme || '://' || $hostNoPort || $path ||
       | CASE WHEN $sortedQ != '' THEN '?' || $sortedQ ELSE '' END)""".stripMargin
  }
}
