package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.FusedUnary

/** URL canonicalization (SURVEY §2.11 extension): the front-end a real
  * crawl pipeline runs before any per-domain operator — RefinedWeb's
  * domain caps ([[Scale.groupCap]], xk10/xk14) and per-host quality
  * rollups key on the CANONICAL host, not the raw crawl string.
  *
  * Rules (the conservative, semantics-preserving subset): scheme and
  * host lowercase; leading `www.` stripped; default port dropped
  * (http:80 / https:443, others kept); path cleaned of duplicate
  * slashes, `/./` segments and `/seg/../` climbs (multi-level and
  * adjacent climbs resolved by bounded iteration, leading climbs
  * clamped at root), trailing
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
  * dot-segments, one- and multi-level `../` climbs, fragments,
  * query strings) — built
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
      .when(pmod(docId, lit(5)) === 2, "/a/skip/../b")
      .when(pmod(docId, lit(5)) === 3, "/u/v/../../w").otherwise("/a/b")
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
       |  WHEN 2 THEN '/a/skip/../b' WHEN 3 THEN '/u/v/../../w'
       |  ELSE '/a/b' END) ||
       |'/doc' || ($id % 100) ||
       |(CASE WHEN $id % 7 = 0 THEN '/' ELSE '' END) ||
       |(CASE WHEN $id % 6 = 0 THEN '?q=' || ($id % 11) ELSE '' END) ||
       |(CASE WHEN $id % 2 = 0 THEN '#sec' || ($id % 9) ELSE '' END)"""
      .stripMargin.replace('\n', ' ')

  /** Rounds of dot-segment resolution. A single `g` replace never
    * rescans replaced text, so adjacent/nested occurrences
    * (`/a/b/../../c`, `/././`) survive one pass; each round strictly
    * shrinks any still-resolvable path, and 6 rounds cover ≥6
    * pathological nesting levels (real crawl paths: 1-2). Both
    * engines run the SAME round count, so oracle parity holds even
    * on deeper synthetic monsters.
    */
  private[operators] val CanonRounds = 6

  /** Canonical path: duplicate-slash collapse, `/./` removal, `..`
    * climbs (multi-level + adjacent via [[CanonRounds]] iterations,
    * trailing `/..` and root-clamped leading `/../` included),
    * trailing-slash trim, empty → `/`. One fused expression
    * ([[CanonPathExpr]]): a JVM loop to the FIXED POINT, capped at
    * [[CanonRounds]] — a clean path exits after one round, and the
    * cap makes the result identical to the oracle's [[CanonRounds]]
    * unrolled rounds in every case (extra rounds past the fixed
    * point are no-ops; a deeper-than-cap monster stops at the same
    * round in both engines). Two rejected column formulations: the
    * plain 6-round chain ran 24 regex passes on EVERY row (bench:
    * 4× cpu), and a CASE-guarded chain triples the subtree per round
    * — Catalyst paid seconds planning the ~4^6-node tree.
    */
  private def canonPath(path: Column): Column =
    Bridge.column(CanonPathExpr(Bridge.expression(path)))

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
    // Same CanonRounds iteration as canonPath: RE2's global replace
    // also skips replaced text, so the round structure must match.
    val rounds = (1 to CanonRounds).foldLeft(rawPath) { (p, _) =>
      val a = s"REGEXP_REPLACE($p, '/{2,}', '/', 'g')"
      val b = s"REGEXP_REPLACE($a, '/\\./', '/', 'g')"
      val c = s"REGEXP_REPLACE($b, '/[^/]+/\\.\\./', '/', 'g')"
      s"REGEXP_REPLACE($c, '/[^/]+/\\.\\.$$', '/', 'g')"
    }
    val lead = s"REGEXP_REPLACE($rounds, '^(/\\.\\.)+(/|$$)', '/')"
    val p4 = s"REGEXP_REPLACE($lead, '/$$', '')"
    val path = s"(CASE WHEN $p4 = '' THEN '/' ELSE $p4 END)"
    val query = s"REGEXP_EXTRACT($url, '\\?([^#]*)', 1)"
    s"$scheme || '://' || ${canonicalHostSql(url)} || " +
      s"(CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80') " +
      s"OR ($scheme = 'https' AND $port = '443') THEN '' " +
      s"ELSE ':' || $port END) || $path || " +
      s"(CASE WHEN $query = '' THEN '' ELSE '?' || $query END)"
  }
}

/** Fixed-point dot-segment resolution of a URL path (see
  * [[Urls.canonPath]]): per round — duplicate-slash collapse, `/./`
  * removal, `/seg/../` climbs, trailing `/..` — looped until
  * unchanged or [[Urls.CanonRounds]] rounds, then the root-clamped
  * leading-climb fix, trailing-slash trim, empty → `/`. Java
  * `replaceAll` and RE2's `g` replace share the no-rescan contract,
  * so each round equals the oracle's round exactly; the cap makes
  * the round COUNT equal too.
  */
case class CanonPathExpr(child: Expression)
    extends UnaryExpression with FusedUnary {

  override def dataType: DataType = StringType
  override def prettyName: String = "canon_path"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"canon_path expects string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    import CanonPathExpr._
    var p = input.toString
    var i = 0
    while (i < Urls.CanonRounds) {
      val next = Climb2.matcher(
        Climb.matcher(
          Dot.matcher(
            Dup.matcher(p).replaceAll("/")).replaceAll("/"))
          .replaceAll("/")).replaceAll("/")
      if (next == p) i = Urls.CanonRounds
      else { p = next; i += 1 }
    }
    p = Lead.matcher(p).replaceAll("/")
    p = Trail.matcher(p).replaceAll("")
    UTF8String.fromString(if (p.isEmpty) "/" else p)
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object CanonPathExpr {
  import java.util.regex.Pattern
  private val Dup = Pattern.compile("/{2,}")
  private val Dot = Pattern.compile("/\\./")
  private val Climb = Pattern.compile("/[^/]+/\\.\\./")
  private val Climb2 = Pattern.compile("/[^/]+/\\.\\.$")
  private val Lead = Pattern.compile("^(/\\.\\.)+(/|$)")
  private val Trail = Pattern.compile("/$")
}
