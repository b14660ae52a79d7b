package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** URL canonicalization — the crawl-ingest op that decides "same
  * page?" before any content comparison runs: a web-scale pipeline
  * dedups fetch frontiers and groups documents by canonical URL and
  * registered domain long before text-level dedup is affordable.
  * Rule set (deterministic, engine-shared — each rule is a
  * regex/string op both Spark and DuckDB evaluate identically):
  *
  *   1. drop the fragment (`#…` never reaches the server);
  *   2. lowercase the scheme and the host (RFC 3986 §6.2.2.1);
  *   3. strip the scheme's default port (`:80` http, `:443` https);
  *   4. empty path → `/`;
  *   5. drop `utm_*` tracking parameters, sort the survivors
  *      byte-lexicographically, rejoin (param order is not
  *      significant to origin servers; tracking params are noise);
  *   6. registered domain = last two dot-labels of the host (the
  *      naive public-suffix rule, documented — a real deployment
  *      swaps in the PSL table as a broadcast join).
  *
  * Scale shape: pure per-row projection — zero shuffles, zero state,
  * column pruning to (doc_id, url). Like [[HtmlExtract]], stateless ⇒
  * runs unchanged over Structured Streaming sources.
  */
object UrlNorm {

  /** scheme (group 1), authority (group 2), path (group 3) — RE2-safe. */
  val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  val QueryRe = "\\?([^#]*)"
  val FragmentRe = "#.*$"

  /** Appends (canonical_url, host, domain, n_params) to rows carrying
    * a `urlCol` string column.
    */
  def canonicalize(docs: DataFrame, urlCol: String = "url"): DataFrame = {
    val noFrag = regexp_replace(col(urlCol), FragmentRe, "")
    val scheme = lower(regexp_extract(noFrag, SchemeRe, 1))
    val rawHost = lower(regexp_extract(noFrag, HostRe, 1))
    val host = when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
      .when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
      .otherwise(rawHost)
    val path0 = regexp_extract(noFrag, PathRe, 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val params = array_sort(filter(split(
      regexp_extract(noFrag, QueryRe, 1), "&"),
      p => length(p) > 0 && !p.startsWith("utm_")))
    val hostNoPort = regexp_replace(host, ":[0-9]+$", "")
    val labels = split(hostNoPort, "\\.")
    val domain = when(size(labels) >= 2,
        concat(element_at(labels, -2), lit("."), element_at(labels, -1)))
      .otherwise(hostNoPort)
    docs
      .withColumn("canonical_url",
        concat(scheme, lit("://"), host, path,
          when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
            .otherwise(lit(""))))
      .withColumn("host", host)
      .withColumn("domain", domain)
      .withColumn("n_params", size(params).cast("long"))
  }

  /** Deterministic messy-URL fixture built from doc ids — mixed-case
    * scheme/host, default and explicit ports, tracking params,
    * unsorted query, fragments: every rule fires somewhere.
    */
  def syntheticUrl(docId: Column): Column =
    concat(
      when(docId % 2 === 0, lit("HTTP://")).otherwise(lit("https://")),
      lit("Sub"), (docId % 5).cast("string"), lit(".Example"),
      (docId % 7).cast("string"), lit(".COM"),
      when(docId % 2 === 0, lit(":80"))
        .when(docId % 3 === 0, lit(":443"))
        .when(docId % 5 === 0, lit(":8080")).otherwise(lit("")),
      when(docId % 4 === 0, lit("")).otherwise(
        concat(lit("/articles/item-"), docId.cast("string"))),
      lit("?utm_source=feed&z="), (docId % 3).cast("string"),
      lit("&a="), (docId % 11).cast("string"),
      when(docId % 2 === 0, lit("#section-2")).otherwise(lit("")))

  /** Q115 — canonicalize the messy fixture URLs:
    * (doc_id, canonical_url, host, domain, n_params).
    */
  def q115UrlCanon(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    canonicalize(Tables.load(spark, dir, "documents")
        .select($"doc_id", syntheticUrl($"doc_id").as("url")))
      .select($"doc_id", $"canonical_url", $"host", $"domain", $"n_params")
      .orderBy($"doc_id")
  }

  /** DuckDB oracle for [[q115UrlCanon]] — same regex constants, same
    * rule order, list ops mirroring the HOFs.
    */
  def oracleSql: String =
    s"""WITH u AS (
       |  SELECT doc_id,
       |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'https://' END) ||
       |    'Sub' || (doc_id % 5)::VARCHAR || '.Example' ||
       |    (doc_id % 7)::VARCHAR || '.COM' ||
       |    (CASE WHEN doc_id % 2 = 0 THEN ':80'
       |          WHEN doc_id % 3 = 0 THEN ':443'
       |          WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END) ||
       |    (CASE WHEN doc_id % 4 = 0 THEN ''
       |          ELSE '/articles/item-' || doc_id::VARCHAR END) ||
       |    '?utm_source=feed&z=' || (doc_id % 3)::VARCHAR ||
       |    '&a=' || (doc_id % 11)::VARCHAR ||
       |    (CASE WHEN doc_id % 2 = 0 THEN '#section-2' ELSE '' END) AS url
       |  FROM documents),
       | nf AS (SELECT doc_id, regexp_replace(url, '$FragmentRe', '') AS nofrag
       |   FROM u),
       | parts AS (SELECT doc_id, nofrag,
       |     lower(regexp_extract(nofrag, '$SchemeRe', 1)) AS scheme,
       |     lower(regexp_extract(nofrag, '$HostRe', 1)) AS rawhost,
       |     regexp_extract(nofrag, '$PathRe', 1) AS path0,
       |     list_sort(list_filter(string_split(
       |       regexp_extract(nofrag, '$QueryRe', 1), '&'),
       |       p -> len(p) > 0 AND NOT starts_with(p, 'utm_'))) AS params
       |   FROM nf),
       | hosts AS (SELECT *,
       |     CASE WHEN scheme = 'http' THEN regexp_replace(rawhost, ':80$$', '')
       |          WHEN scheme = 'https' THEN regexp_replace(rawhost, ':443$$', '')
       |          ELSE rawhost END AS host
       |   FROM parts),
       | canon AS (SELECT doc_id, host, params,
       |     scheme || '://' || host ||
       |       (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
       |       (CASE WHEN len(params) > 0
       |         THEN '?' || array_to_string(params, '&') ELSE '' END)
       |       AS canonical_url,
       |     string_split(regexp_replace(host, ':[0-9]+$$', ''), '.') AS labels
       |   FROM hosts)
       |SELECT doc_id, canonical_url, host,
       |  CASE WHEN len(labels) >= 2
       |    THEN labels[-2] || '.' || labels[-1]
       |    ELSE array_to_string(labels, '.') END AS domain,
       |  len(params)::BIGINT AS n_params
       |FROM canon ORDER BY doc_id""".stripMargin
}
