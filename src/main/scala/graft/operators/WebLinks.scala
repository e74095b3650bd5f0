package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §2.3 (round 9) — URL/link extraction + registrable-domain
  * audit: the provenance pass of web curation. After boilerplate
  * strip (q157) and rule filtering (q158), a corpus pipeline needs
  * to know WHERE its pages point — per-domain link concentration
  * drives blocklist verdicts (spam/SEO farms), per-doc link counts
  * feed quality scores, and registrable-domain rollups are how
  * crawl-quota and per-site-cap policies (C4, RefinedWeb, FineWeb
  * all cap per-domain contributions) are enforced.
  *
  * Everything before the rollup is NARROW: one regex pass extracts
  * anchors, per-link normalization (scheme strip, host lowercase,
  * query/fragment drop, registrable-domain suffix rule) is string
  * arithmetic fused into the scan. The only shuffle is the
  * bounded-cardinality domain groupBy (domains ≪ links); the
  * blocklist rides the plan as a broadcast literal array — at
  * 100 TB the corpus never shuffles to meet a blocklist table.
  *
  * Reference anchor: the reference's import layer fetches from
  * FTP/HTTP endpoints (import-api-ftp.R:29-40) — this is the same
  * URL-handling concern lifted to corpus scale.
  */
object WebLinks {

  /** Scheme + host + optional path/query/fragment, matched
    * case-insensitively; the char classes mirror what DuckDB's RE2
    * supports so the oracle regex is byte-identical. */
  val urlRe: String = "(?i)https?://[a-z0-9.-]+(?:/[^ \"<>]*)?"

  /** Multi-label public suffixes recognized by the registrable-domain
    * rule (a deliberately small, literal public-suffix-list slice —
    * the real PSL is a data file, but the RULE shape is identical:
    * longest matching suffix + one label). */
  val multiPartSuffixes: Seq[String] = Seq("co.uk", "ac.uk", "com.au")

  /** host → registrable domain: last 3 labels when the trailing two
    * form a multi-part public suffix, else last 2 (bare or one-label
    * hosts pass through unchanged). Pure column arithmetic. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", slice(labels, -2, 2))
    when(n >= 3 && lastTwo.isInCollection(multiPartSuffixes),
      concat_ws(".", slice(labels, -3, 3)))
      .when(n >= 2, lastTwo)
      .otherwise(host)
  }

  /** One row per extracted link: (doc_id, url, host, domain). The
    * normalized `url` is scheme-less, host-lowercased, query- and
    * fragment-stripped; `host` drops any :port. */
  def extractLinks(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val raw = col("__raw")
    // normalize: drop scheme, lowercase the authority, cut ?query/#frag
    val noScheme = regexp_replace(raw, "(?i)^https?://", "")
    val noQf = regexp_extract(noScheme, "^([^?#]*)", 1)
    val host = lower(regexp_extract(noQf, "^([^/:]+)", 1))
    val path = regexp_extract(noQf, "^[^/]*(/.*)?$", 1)
    docs
      .select(col(idCol).as("doc_id"),
        explode(regexp_extract_all(col(htmlCol), lit(urlRe), lit(0))).as("__raw"))
      .select(col("doc_id"),
        concat(host, coalesce(path, lit(""))).as("url"),
        host.as("host"))
      .withColumn("domain", registrableDomain(col("host")))
  }

  /** Full URL canonicalization for URL-key dedup (round 11): crawl
    * frontiers and re-crawl dedup key on the canonical URL, where
    * `HTTPS://www.Site.com/p1?utm=x#top` ≡ `http://site.com/p1` —
    * scheme/case/fragment/tracking-param variants of one resource.
    * Rules (each pure column arithmetic, fused into the scan):
    * scheme strip + host lowercase + `www.` strip, fragment strip,
    * `utm*` tracking params dropped, surviving params SORTED (param
    * order is semantically irrelevant), trailing `/` strip. Returns
    * (canonical_host, canonical) per extracted link. */
  def canonicalizeUrls(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val noFrag = regexp_replace(
      regexp_replace(col("__raw"), "(?i)^https?://", ""), "#.*$", "")
    val hostPath = regexp_extract(noFrag, "^([^?]*)", 1)
    val qs = regexp_extract(noFrag, "\\?(.*)$", 1)
    val host = regexp_replace(
      lower(regexp_extract(hostPath, "^([^/:]+)", 1)), "^www\\.", "")
    val path = regexp_replace(
      coalesce(regexp_extract(hostPath, "^[^/]*(/.*)?$", 1), lit("")), "/$", "")
    val keep = array_join(array_sort(filter(split(qs, "&"),
      p => (p =!= "") && not(p.startsWith("utm")))), "&")
    docs
      .select(col(idCol).as("doc_id"),
        explode(regexp_extract_all(col(htmlCol), lit(urlRe), lit(0))).as("__raw"))
      .select(col("doc_id"), host.as("canonical_host"),
        concat(host, path,
          when(keep =!= "", concat(lit("?"), keep)).otherwise(lit("")))
          .as("canonical"))
  }

  /** Per-registrable-domain rollup with blocklist verdicts:
    * (domain, n_links, n_docs, n_hosts, blocked). Link rows shuffle
    * once on the bounded domain key; the blocklist is a literal set
    * folded into the projection (no join). */
  def domainAudit(docs: DataFrame, idCol: String, htmlCol: String,
                  blocklist: Seq[String]): DataFrame =
    extractLinks(docs, idCol, htmlCol)
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"))
      .withColumn("blocked",
        col("domain").isInCollection(blocklist).cast("int"))

  /** Per-document link-profile: (doc_id, n_links, n_domains,
    * max_domain_links, blocked_links) — the doc-level quality signal
    * (link farms have many links concentrated in few domains;
    * `blocked_links > 0` is a drop verdict upstream filters consume).
    * Two bounded groupBys on (doc, domain) then (doc). */
  def docLinkProfile(docs: DataFrame, idCol: String, htmlCol: String,
                     blocklist: Seq[String]): DataFrame =
    extractLinks(docs, idCol, htmlCol)
      .groupBy(col("doc_id"), col("domain"))
      .agg(count(lit(1)).as("dn"),
        sum(col("domain").isInCollection(blocklist).cast("long")).as("bn"))
      .groupBy(col("doc_id"))
      .agg(sum(col("dn")).as("n_links"),
        count(lit(1)).as("n_domains"),
        max(col("dn")).as("max_domain_links"),
        sum(col("bn")).as("blocked_links"))
}
