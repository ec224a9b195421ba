package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization (SURVEY §2.11 extension): the front-end a real
  * crawl pipeline runs before any per-domain operator — RefinedWeb's
  * domain caps ([[Scale.groupCap]], xk10/xk14) and per-host quality
  * rollups key on the CANONICAL host, not the raw crawl string.
  *
  * Rules (the conservative, semantics-preserving subset): scheme and
  * host lowercase; leading `www.` stripped; default port dropped
  * (http:80 / https:443, others kept); path cleaned of duplicate
  * slashes, `/./` segments and one-level `/seg/../` climbs, trailing
  * slash trimmed (root stays `/`, empty becomes `/`); fragment
  * dropped; query kept verbatim. Everything is a narrow per-row map:
  * Spark's `parse_url` (java.net.URI) splits the URL, builtin string
  * expressions do the rest — zero shuffle at any corpus size. The
  * DuckDB oracle re-derives every part with ITS OWN regex parser
  * ([[canonicalizeSql]]), so the hash gate compares two independent
  * implementations of the spec, not one shared regex.
  *
  * The driver testdata carries no URL column, so [[syntheticUrl]]
  * derives a deterministically MESSY url per document (mixed-case
  * scheme/host, www., default and explicit ports, duplicate slashes,
  * dot-segments, one `../` climb, fragments, query strings) — built
  * by the same arithmetic in both engines, then canonicalized
  * independently.
  */
object Urls {

  /** Deterministic messy URL from (doc_id, source). Each branch count
    * is coprime-ish so the cross product covers scheme×www×port×path×
    * frag×query combinations across a corpus.
    */
  def syntheticUrl(docId: Column, source: Column): Column = {
    val scheme = when(pmod(docId, lit(3)) === 0, "HTTP")
      .when(pmod(docId, lit(3)) === 1, "https").otherwise("hTtp")
    val www = when(pmod(docId, lit(2)) === 0, "WWW.").otherwise("")
    val host = concat(www, upper(source), lit(".Example.COM"))
    val port = when(pmod(docId, lit(4)) === 0, ":80")
      .when(pmod(docId, lit(4)) === 1, ":443")
      .when(pmod(docId, lit(4)) === 2, ":8080").otherwise("")
    val seg1 = when(pmod(docId, lit(5)) === 0, "/a//b")
      .when(pmod(docId, lit(5)) === 1, "/a/./b")
      .when(pmod(docId, lit(5)) === 2, "/a/skip/../b").otherwise("/a/b")
    val tail = when(pmod(docId, lit(7)) === 0, "/").otherwise("")
    val frag = when(pmod(docId, lit(2)) === 0,
      concat(lit("#sec"), pmod(docId, lit(9)))).otherwise("")
    val query = when(pmod(docId, lit(6)) === 0,
      concat(lit("?q="), pmod(docId, lit(11)))).otherwise("")
    concat(scheme, lit("://"), host, port, seg1,
      lit("/doc"), pmod(docId, lit(100)), tail, query, frag)
  }

  /** The same derivation in DuckDB SQL (`id`, `src` expressions). */
  def syntheticUrlSql(id: String, src: String): String =
    s"""(CASE $id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https'
       |  ELSE 'hTtp' END) || '://' ||
       |(CASE WHEN $id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
       |UPPER($src) || '.Example.COM' ||
       |(CASE $id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
       |  WHEN 2 THEN ':8080' ELSE '' END) ||
       |(CASE $id % 5 WHEN 0 THEN '/a//b' WHEN 1 THEN '/a/./b'
       |  WHEN 2 THEN '/a/skip/../b' ELSE '/a/b' END) ||
       |'/doc' || ($id % 100) ||
       |(CASE WHEN $id % 7 = 0 THEN '/' ELSE '' END) ||
       |(CASE WHEN $id % 6 = 0 THEN '?q=' || ($id % 11) ELSE '' END) ||
       |(CASE WHEN $id % 2 = 0 THEN '#sec' || ($id % 9) ELSE '' END)"""
      .stripMargin.replace('\n', ' ')

  /** Canonical path: one-level `..` climb, `/./` removal, duplicate-
    * slash collapse, trailing-slash trim, empty → `/`. Fixed replace
    * order; the three patterns are identical in Java regex and RE2.
    */
  private def canonPath(path: Column): Column = {
    val p1 = regexp_replace(path, "/[^/]+/\\.\\./", "/")
    val p2 = regexp_replace(p1, "/\\./", "/")
    val p3 = regexp_replace(p2, "/{2,}", "/")
    val p4 = regexp_replace(p3, "/$", "")
    when(p4 === "", "/").otherwise(p4)
  }

  /** Canonical host of a raw url column (lowercase, www-stripped). */
  def canonicalHost(url: Column): Column =
    regexp_replace(lower(parse_url(url, lit("HOST"))), "^www\\.", "")

  /** Full canonical URL of a raw url column (see object doc). */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(parse_url(url, lit("PROTOCOL")))
    val host = canonicalHost(url)
    val port =
      regexp_extract(parse_url(url, lit("AUTHORITY")), ":(\\d+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val path = canonPath(coalesce(parse_url(url, lit("PATH")), lit("")))
    val query = parse_url(url, lit("QUERY"))
    val queryPart = when(query.isNull, "")
      .otherwise(concat(lit("?"), query))
    concat(scheme, lit("://"), host, portPart, path, queryPart)
  }

  /** DuckDB replay of [[canonicalHost]]/[[canonicalUrl]] over a url
    * expression — an independent regex parser, not parse_url.
    */
  def canonicalHostSql(url: String): String =
    "REGEXP_REPLACE(LOWER(REGEXP_REPLACE(REGEXP_EXTRACT(" +
      s"$url, '^[^:]+://([^/?#]+)', 1), ':[0-9]+$$', '')), '^www\\.', '')"

  def canonicalUrlSql(url: String): String = {
    val scheme = s"LOWER(REGEXP_EXTRACT($url, '^([^:]+)://', 1))"
    val auth = s"REGEXP_EXTRACT($url, '^[^:]+://([^/?#]+)', 1)"
    val port = s"REGEXP_EXTRACT($auth, ':([0-9]+)$$', 1)"
    val rawPath = s"REGEXP_EXTRACT($url, '^[^:]+://[^/?#]+([^?#]*)', 1)"
    val p1 = s"REGEXP_REPLACE($rawPath, '/[^/]+/\\.\\./', '/', 'g')"
    val p2 = s"REGEXP_REPLACE($p1, '/\\./', '/', 'g')"
    val p3 = s"REGEXP_REPLACE($p2, '/{2,}', '/', 'g')"
    val p4 = s"REGEXP_REPLACE($p3, '/$$', '')"
    val path = s"(CASE WHEN $p4 = '' THEN '/' ELSE $p4 END)"
    val query = s"REGEXP_EXTRACT($url, '\\?([^#]*)', 1)"
    s"$scheme || '://' || ${canonicalHostSql(url)} || " +
      s"(CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80') " +
      s"OR ($scheme = 'https' AND $port = '443') THEN '' " +
      s"ELSE ':' || $port END) || $path || " +
      s"(CASE WHEN $query = '' THEN '' ELSE '?' || $query END)"
  }
}
