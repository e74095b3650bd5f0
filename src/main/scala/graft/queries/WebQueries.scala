package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.WebLinks

/** SURVEY.md §2.3 (round 9) — web-provenance tier: URL/link
  * extraction, registrable-domain rollups, blocklist verdicts. The
  * corpus pages carry deterministically planted links (mirrored
  * verbatim in the oracle SQL) so both engines audit byte-identical
  * pages — the q157/q158 planted-page discipline.
  */
object WebQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Domains the audit flags — a stand-in for a spam/SEO blocklist. */
  private val blocklist = Seq("site1.com", "site5.org", "site3.co.uk")

  /** Deterministic link plant: doc text + (doc_id % 4 + 1) URLs whose
    * every part — scheme case, www. prefix, site number, TLD, path,
    * query, fragment — is integer-derived from (doc_id, i). Exercises
    * scheme stripping, case folding, query/fragment removal, and the
    * multi-part-suffix registrable-domain rule. Mirrored verbatim in
    * [[linkPagesSql]].
    */
  private def linkPages(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" "),
        array_join(transform(sequence(lit(0), (col("doc_id") % 4).cast("int")),
          i => {
            val k = col("doc_id") + i
            concat(
              when(k % 5 === 0, "HTTPS://").otherwise("http://"),
              when(k % 2 === 0, "www.").otherwise(""),
              lit("site"), ((col("doc_id") * 7 + i * 13) % 23).cast("string"),
              lit("."),
              element_at(array(lit("com"), lit("org"), lit("net"), lit("co.uk")),
                (k % 4).cast("int") + 1),
              when(k % 3 =!= 0, concat(lit("/p"), ((col("doc_id") * 3 + i) % 11).cast("string")))
                .otherwise(""),
              when(k % 5 === 0, "?utm=x").otherwise(""),
              when(k % 7 === 0, "#top").otherwise(""))
          }), " ")).as("page"))

  /** DuckDB mirror of [[linkPages]] — byte-identical page strings. */
  private val linkPagesSql =
    """pages AS (
      |  SELECT doc_id, text || ' ' || array_to_string(
      |    [ CASE WHEN (doc_id + i) % 5 = 0 THEN 'HTTPS://' ELSE 'http://' END ||
      |      CASE WHEN (doc_id + i) % 2 = 0 THEN 'www.' ELSE '' END ||
      |      'site' || CAST((doc_id * 7 + i * 13) % 23 AS VARCHAR) || '.' ||
      |      ['com','org','net','co.uk'][CAST((doc_id + i) % 4 AS INT) + 1] ||
      |      CASE WHEN (doc_id + i) % 3 <> 0
      |           THEN '/p' || CAST((doc_id * 3 + i) % 11 AS VARCHAR) ELSE '' END ||
      |      CASE WHEN (doc_id + i) % 5 = 0 THEN '?utm=x' ELSE '' END ||
      |      CASE WHEN (doc_id + i) % 7 = 0 THEN '#top' ELSE '' END
      |      FOR i IN generate_series(0, CAST(doc_id % 4 AS INT)) ],
      |    ' ') AS page
      |  FROM documents
      |)""".stripMargin

  /** DuckDB mirror of WebLinks.extractLinks over `pages`:
    * links(doc_id, url, host, domain). */
  private val linksSql =
    s"""$linkPagesSql,
      |raw AS (
      |  SELECT doc_id,
      |    unnest(regexp_extract_all(page, '(?i)https?://[a-z0-9.-]+(?:/[^ "<>]*)?'))
      |      AS u
      |  FROM pages),
      |norm AS (
      |  SELECT doc_id,
      |    regexp_extract(regexp_replace(u, '(?i)^https?://', ''), '^([^?#]*)', 1)
      |      AS noqf
      |  FROM raw),
      |links AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(noqf, '^([^/:]+)', 1)) ||
      |      coalesce(regexp_extract(noqf, '^[^/]*(/.*)?$$', 1), '') AS url,
      |    lower(regexp_extract(noqf, '^([^/:]+)', 1)) AS host,
      |    CASE
      |      WHEN len(string_split(lower(regexp_extract(noqf, '^([^/:]+)', 1)), '.')) >= 3
      |       AND array_to_string(string_split(lower(regexp_extract(noqf, '^([^/:]+)', 1)), '.')[-2:], '.')
      |           IN ('co.uk', 'ac.uk', 'com.au')
      |      THEN array_to_string(string_split(lower(regexp_extract(noqf, '^([^/:]+)', 1)), '.')[-3:], '.')
      |      WHEN len(string_split(lower(regexp_extract(noqf, '^([^/:]+)', 1)), '.')) >= 2
      |      THEN array_to_string(string_split(lower(regexp_extract(noqf, '^([^/:]+)', 1)), '.')[-2:], '.')
      |      ELSE lower(regexp_extract(noqf, '^([^/:]+)', 1))
      |    END AS domain
      |  FROM norm)""".stripMargin

  val queries: Map[String, Q] = Map(
    // §2.3 (round 9) — registrable-domain rollup + blocklist verdicts
    // over planted link pages: narrow regex extraction fused into the
    // scan, ONE bounded-cardinality domain groupBy, blocklist folded
    // into the projection as a literal set (no join — at 100 TB the
    // link table never shuffles to meet a blocklist).
    "q169_link_audit" -> { (s, d) =>
      WebLinks.domainAudit(linkPages(s, d), "doc_id", "page", blocklist)
        .orderBy(col("domain"))
    },

    // §2.3 (round 9) — per-document link profile: the doc-level
    // quality signal (total links, distinct domains, max same-domain
    // concentration — the link-farm shape — and blocked-link count
    // as a drop verdict). Two bounded groupBys, no join.
    "q170_doc_links" -> { (s, d) =>
      WebLinks.docLinkProfile(linkPages(s, d), "doc_id", "page", blocklist)
        .orderBy(col("doc_id"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "q169_link_audit" ->
      s"""WITH $linksSql
        |SELECT domain,
        |  CAST(COUNT(*) AS BIGINT) AS n_links,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
        |  CASE WHEN domain IN ('site1.com', 'site5.org', 'site3.co.uk')
        |       THEN 1 ELSE 0 END AS blocked
        |FROM links GROUP BY domain ORDER BY domain""".stripMargin,

    "q170_doc_links" ->
      s"""WITH $linksSql,
        |bydom AS (
        |  SELECT doc_id, domain, COUNT(*) AS dn,
        |    SUM(CASE WHEN domain IN ('site1.com', 'site5.org', 'site3.co.uk')
        |             THEN 1 ELSE 0 END) AS bn
        |  FROM links GROUP BY doc_id, domain)
        |SELECT doc_id,
        |  CAST(SUM(dn) AS BIGINT) AS n_links,
        |  CAST(COUNT(*) AS BIGINT) AS n_domains,
        |  CAST(MAX(dn) AS BIGINT) AS max_domain_links,
        |  CAST(SUM(bn) AS BIGINT) AS blocked_links
        |FROM bydom GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
