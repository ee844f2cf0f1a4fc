package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical URL normalization and host-key extraction — the curation
  * keys a crawl-scale corpus dedups and caps on (the reference's
  * pipeline has no crawl surface, ref transforms.py; this is the
  * LLM-data-pipeline extension: a URL is the natural document identity
  * in web corpora, and near-identical raw URLs — tracking params,
  * fragments, case, default ports — are the single largest source of
  * trivially-exact duplicates).
  *
  * Canonical form (documented contract):
  *  - scheme and host lowercased (ASCII fold — the portable
  *    [[TextHash.asciiLower]] translate, identical in every engine);
  *    PATH AND QUERY CASE PRESERVED (case-sensitive per RFC 3986)
  *  - fragment dropped
  *  - default port stripped (http:80, https:443); other ports kept
  *  - tracking params dropped (utm_*, gclid, fbclid, ref —
  *    case-insensitive key match; values untouched), remaining params
  *    sorted byte-wise (order-insensitive dedup identity), empty
  *    query dropped
  *  - empty path canonicalized to "/"
  *  - userinfo (user:pass@) is NOT handled — out of the corpus shape
  * Host key: lowercased host, port stripped, leading "www." stripped —
  * the per-site cap/dedup partition key.
  *
  * Everything is built from codegen'd string built-ins
  * (regexp_extract/replace, split, sort_array) — no HOFs, no UDFs;
  * each builder has a Spark `Column` and a DuckDB SQL emitter sharing
  * the SAME pattern constants so the two formulations cannot drift
  * (the TextHash twin-emitter discipline). The SQL emitters use
  * regexp_replace(..., 'g') — DuckDB replaces first-match by default
  * where Spark replaces all.
  *
  * Scale: pure per-row projections — no shuffle, no state; the
  * downstream consumers (exact dedup groupBy, per-host cap) shuffle on
  * the keys this file produces, which is exactly the partitioning a
  * 100 TB crawl wants (host keys are the natural skew axis — feed
  * them to Skew.saltedAgg when a mega-site dominates).
  */
object Urls {

  /** Tracking parameters stripped by canonicalization, matched on the
    * "key=value" form at a param boundary. The key match is
    * CASE-INSENSITIVE (`(?i:...)` — same syntax and semantics in Java
    * regex and RE2): real crawls carry `UTM_Source=`/`Ref=` variants,
    * and a case-exact match would let them survive canonicalization
    * and split otherwise-identical canonical keys — inconsistent with
    * the case-fold rationale applied to scheme/host (r13 advice). */
  val TrackingPat = "(^|&)(?i:utm_[a-z0-9]+|gclid|fbclid|ref)=[^&]*"
  private val SchemePat = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostPortPat = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  private val PathPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
  // \z (end of TEXT), not $: RE2's $ and Java's $ disagree about the
  // final newline; \z means the same thing in both (the NOTES rule)
  private val PortTailPat = ":([0-9]+)\\z"
  private val StripPortPat = ":[0-9]+\\z"
  private val WwwPat = "^www\\."
  private val FragPat = "#.*"

  // ---- Spark Column builders -------------------------------------------

  private def stripFrag(u: Column): Column = regexp_replace(u, FragPat, "")

  def scheme(u: Column): Column =
    TextHash.asciiLower(regexp_extract(stripFrag(u), SchemePat, 1))

  private def hostPort(base: Column): Column =
    TextHash.asciiLower(regexp_extract(base, HostPortPat, 1))

  /** Canonical URL (see object doc for the normal form). */
  def canonicalUrl(u: Column): Column = {
    val base = stripFrag(u)
    val sch = TextHash.asciiLower(regexp_extract(base, SchemePat, 1))
    val hp = hostPort(base)
    val host = regexp_replace(hp, StripPortPat, "")
    val port = regexp_extract(hp, PortTailPat, 1)
    val hostOut = when(port === "" ||
        (sch === "http" && port === "80") ||
        (sch === "https" && port === "443"), host)
      .otherwise(concat(host, lit(":"), port))
    val path0 = regexp_extract(base, PathPat, 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q0 = regexp_extract(base, "\\?(.*)", 1)
    // after tracking-strip: collapse raw '&&' runs and trim boundary
    // '&'s so split never yields EMPTY params — an empty segment would
    // sort to the front and rejoin as a leading '&', breaking the
    // fixed-point (idempotence) contract ('?a=1&' vs '?a=1' must share
    // one canonical key)
    val q1 = regexp_replace(
      regexp_replace(regexp_replace(q0, TrackingPat, ""), "&&+", "&"),
      "^&+|&+\\z", "")
    val q2 = when(q1 === "", lit(""))
      .otherwise(array_join(sort_array(split(q1, "&")), "&"))
    concat(sch, lit("://"), hostOut, path,
      when(q2 === "", lit("")).otherwise(concat(lit("?"), q2)))
  }

  /** Host key: lowercased host, port stripped, leading www. stripped. */
  def hostKey(u: Column): Column =
    regexp_replace(
      regexp_replace(hostPort(stripFrag(u)), StripPortPat, ""), WwwPat, "")

  // ---- DuckDB SQL emitters (same pattern constants) ----------------------

  def stripFragSql(u: String): String =
    s"regexp_replace($u, '$FragPat', '', 'g')"
  def schemeSql(base: String): String =
    TextHash.asciiLowerSql(s"regexp_extract($base, '$SchemePat', 1)")
  def hostPortSql(base: String): String =
    TextHash.asciiLowerSql(s"regexp_extract($base, '$HostPortPat', 1)")
  def pathSql(base: String): String =
    s"regexp_extract($base, '$PathPat', 1)"
  def querySql(base: String): String =
    s"regexp_extract($base, '\\?(.*)', 1)"
  def stripPortSql(hp: String): String =
    s"regexp_replace($hp, '$StripPortPat', '', 'g')"
  def portSql(hp: String): String =
    s"regexp_extract($hp, '$PortTailPat', 1)"
  def cleanQuerySql(q0: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($q0, '$TrackingPat', '', 'g'), '&&+', '&', 'g'), '^&+|&+\\z', '', 'g')"
  def sortParamsSql(q1: String): String =
    s"CASE WHEN $q1 = '' THEN '' ELSE array_to_string(list_sort(string_split($q1, '&')), '&') END"
  def hostKeyFromHostSql(host: String): String =
    s"regexp_replace($host, '$WwwPat', '', 'g')"
}
