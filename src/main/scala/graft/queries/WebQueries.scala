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
    },

    // §2.3 (round 9, widened round 10) — training-shard EXPORT
    // MANIFEST: the table a trainer consumes before reading a single
    // shard — per shard: doc count, char volume, and an
    // ORDER-INVARIANT id checksum. The checksum is deliberately NOT
    // an ordered digest: an ordered digest needs the shard's full id
    // list in one aggregation buffer (corpus/16 rows per group at
    // scale), while a hash SUM is associative → map-side partials,
    // bounded state, same corruption-detection power for a
    // set-membership check. Width: TWO independent 32-bit md5 lanes
    // (combined collision bound 2⁻⁶⁴ per corruption event — a single
    // 32-bit sum is birthday-plausible to collide silently at 10⁹
    // docs/shard). Two BIGINT lanes instead of one 64-bit lane
    // because each lane's exact sum then stays < 2⁶² up to 2³⁰
    // docs/shard in BOTH engines — a 64-bit lane would need mod-2⁶⁴
    // wraparound, which ANSI Spark refuses (overflow throws) and
    // DuckDB's HUGEINT sum doesn't perform. Shard key = q85's md5
    // arithmetic.
    "q178_shard_manifest" -> { (s, d) =>
      val h = md5(concat(lit("q85:"), col("doc_id").cast("string")))
      val ckh = md5(concat(lit("ck:"), col("doc_id").cast("string")))
      Tables.documents(s, d)
        .select((conv(substring(h, 1, 8), 16, 10).cast("long") % 16).as("shard"),
          col("n_chars"),
          conv(substring(ckh, 1, 8), 16, 10).cast("long").as("ck_lo"),
          conv(substring(ckh, 9, 8), 16, 10).cast("long").as("ck_hi"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars_total"),
          sum(col("ck_lo")).cast("long").as("ids_checksum_lo"),
          sum(col("ck_hi")).cast("long").as("ids_checksum_hi"))
        .orderBy(col("shard"))
    },

    // §2.3 (round 9) — INCREMENTAL manifest maintenance: q178's
    // manifest recomputed as BASE (doc_id < 400) ⊎ DELTA (doc_id ≥
    // 400) merged by summing counts/volumes/checksums — the daily-
    // append shape where the multi-TB base is never rescanned. The
    // oracle is the FULL-SCAN manifest over all docs: hash equality
    // PROVES the merge is exact (the whole point of order-invariant
    // additive checksums). Two delta-sized jobs + a 16-row merge.
    "q180_manifest_merge" -> { (s, d) =>
      def manifest(docs: DataFrame): DataFrame = {
        val h = md5(concat(lit("q85:"), col("doc_id").cast("string")))
        val ckh = md5(concat(lit("ck:"), col("doc_id").cast("string")))
        docs
          .select((conv(substring(h, 1, 8), 16, 10).cast("long") % 16).as("shard"),
            col("n_chars"),
            conv(substring(ckh, 1, 8), 16, 10).cast("long").as("ck_lo"),
            conv(substring(ckh, 9, 8), 16, 10).cast("long").as("ck_hi"))
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("n_chars_total"),
            sum(col("ck_lo")).cast("long").as("ids_checksum_lo"),
            sum(col("ck_hi")).cast("long").as("ids_checksum_hi"))
      }
      val docs = Tables.documents(s, d)
      val base = manifest(docs.filter(col("doc_id") < 400))
      val delta = manifest(docs.filter(col("doc_id") >= 400))
      base.unionByName(delta)
        .groupBy(col("shard"))
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("n_chars_total")).cast("long").as("n_chars_total"),
          sum(col("ids_checksum_lo")).cast("long").as("ids_checksum_lo"),
          sum(col("ids_checksum_hi")).cast("long").as("ids_checksum_hi"))
        .orderBy(col("shard"))
    },

    // §2.3 (round 9) — per-DOMAIN contribution cap APPLIED (the
    // C4/RefinedWeb per-site cap): dominant-link-domain key, grouped
    // prefix-sum sequence, keep-first-`cap` in doc order, per-domain
    // kept/dropped ledger.
    "q182_domain_cap" -> { (s, d) => domainCapQuery(s, d) },

    // §2.3 (round 9) — HTML TABLE extraction: semi-structured tables
    // inside crawled pages become typed rows — the q157 boilerplate
    // pass recovers prose; THIS recovers the tabular payload (the
    // other half of web-page content a training pipeline wants).
    // Two nested narrow regex extractions (row split, then cell
    // split with positions), numeric cells typed via a strict-digit
    // probe, non-numeric cells kept as NULL val_int (the quarantine
    // discipline: parse failures are visible, not dropped).
    "q184_table_extract" -> { (s, d) =>
      val rows = tablePages(s, d)
        .select(col("doc_id"), posexplode(
          regexp_extract_all(col("page"),
            lit("<tr>((?:<td>[^<]*</td>)*)</tr>"), lit(1)))
          .as(Seq("row_idx", "rowhtml")))
      rows
        .select(col("doc_id"), col("row_idx"), posexplode(
          regexp_extract_all(col("rowhtml"), lit("<td>([^<]*)</td>"), lit(1)))
          .as(Seq("col_idx", "cell")))
        .withColumn("val_int",
          when(col("cell").rlike("^[0-9]+$"), col("cell").cast("long")))
        .orderBy(col("doc_id"), col("row_idx"), col("col_idx"))
    },

    // §2.3 (round 9) — robots-meta AUDIT: every polite crawler
    // pipeline drops noindex pages BEFORE any curation spend. Planted
    // meta tags (noindex for doc_id%9=0, nofollow for doc_id%7=3,
    // mirrored in the oracle), one narrow regex probe per page, and
    // the keep/drop verdict rollup.
    "q179_robots_audit" -> { (s, d) =>
      val robots = lower(regexp_extract(col("page"),
        "(?i)<meta[^>]*name=\"robots\"[^>]*content=\"([^\"]*)\"", 1))
      robotsPages(s, d)
        .withColumn("robots", robots)
        .select(col("doc_id"),
          col("robots").contains("noindex").cast("int").as("noindex"),
          col("robots").contains("nofollow").cast("int").as("nofollow"))
        .withColumn("verdict",
          when(col("noindex") === 1, "drop").otherwise("keep"))
        .groupBy(col("verdict"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("noindex")).cast("long").as("n_noindex"),
          sum(col("nofollow")).cast("long").as("n_nofollow"))
        .orderBy(col("verdict"))
    },

    // §2.3 (round 11) — URL CANONICALIZATION dedup: a crawl frontier
    // keys on the canonical URL, where scheme case, `www.`,
    // fragments, and `utm*` tracking params are all variants of one
    // resource (the q169 plant generates exactly those variants:
    // `HTTPS://` + `?utm=x` on every k%5==0 link, `www.` on k%2==0).
    // Canonicalization is string arithmetic fused into the scan
    // (WebLinks.canonicalizeUrls); the only shuffles are the bounded
    // host rollup (hosts ≪ links) and its countDistinct expand —
    // at 100 TB the URL stream never joins anything.
    "q211_url_canonical" -> { (s, d) =>
      WebLinks.canonicalizeUrls(linkPages(s, d), "doc_id", "page")
        .groupBy(col("canonical_host"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("canonical")).as("n_canonical"))
        .withColumn("dup_extra",
          (col("n_urls") - col("n_canonical")).cast("long"))
        .withColumn("dup_rate",
          round(col("dup_extra").cast("double") / col("n_urls"), 6))
        .orderBy(col("canonical_host"))
    },

    // §2.3 (round 12) — RE-CRAWL delta audit: before re-ingesting a
    // crawl, measure what actually changed since the last snapshot —
    // per-page shingle Jaccard between the two crawl generations
    // drives both the refresh priority (major-change pages re-enter
    // the pipeline) and dedup cost forecasting (unchanged pages skip
    // it). The previous crawl is derived deterministically (mirrored
    // in the oracle): pages doc_id%17==0 did not exist yet ('new'),
    // pages doc_id%3==0 changed (every 11th word replaced), the rest
    // are byte-identical. Shingle sets are computed IN THE SCAN
    // projection of each side (narrow, per-doc arrays — the
    // ngramJaccard packing), so the only data moved by the equi-join
    // is one array row per page; at 100 TB the two snapshots bucket
    // by url and this joins co-located. Classification runs in exact
    // integer micro-units (j_u = HALF_UP(1e6·|∩|/|∪|) via pure
    // BIGINT arithmetic — no float compare anywhere), and the
    // per-source mean is one double division over exact long sums.
    "q216_recrawl_delta" -> { (s, d) =>
      import graft.functions.GraftFunctions
      import graft.operators.Dedup
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
      val oldDocs = docs.filter(col("doc_id") % 17 =!= 0)
        .select((col("doc_id") + 5000000L).as("doc_id"),
          when(col("doc_id") % 3 === 0,
            array_join(transform(GraftFunctions.normWords(col("text")),
              (w, i) => when(i % 11 === 0, lit("upd")).otherwise(w)), " "))
            .otherwise(col("text")).as("text"))
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(oldDocs)
      val pairs = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + 5000000L).as("doc_b"))
      val j = Dedup.ngramJaccard(corpus, pairs, "doc_id", "text",
          shingleWidth = 3)
        .select(col("doc_a").as("doc_id"),
          // HALF_UP(1e6·ni/u) in pure BIGINT arithmetic (`div`, not
          // `/` — Column./ is IEEE double division)
          expr("(n_inter * 2000000 + (n_a + n_b - n_inter)) div " +
            "((n_a + n_b - n_inter) * 2)").cast("long").as("j_u"))
      val status = when(col("j_u").isNull, "new")
        .when(col("j_u") === 1000000L, "unchanged")
        .when(col("j_u") >= 500000L, "minor")
        .otherwise("major")
      docs.join(j, Seq("doc_id"), "left")
        .select(col("source"), status.as("status"), col("j_u"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_pages"),
          sum((col("status") === "new").cast("long")).as("n_new"),
          sum((col("status") === "unchanged").cast("long")).as("n_unchanged"),
          sum((col("status") === "minor").cast("long")).as("n_minor"),
          sum((col("status") === "major").cast("long")).as("n_major"),
          round(avg(col("j_u")) / 1e6, 6).as("mean_jaccard"))
        .orderBy(col("source"))
    },

    // §2.3 (round 13) — ROBOTS.TXT PARSE + REP longest-match
    // evaluation (RFC 9309; q179 reads per-PAGE meta tags, this is
    // the per-SITE politeness file a crawler must honor BEFORE
    // fetching): parse each domain's robots.txt text into
    // (pattern, allow|disallow) rules, then for every frontier URL
    // apply the REP decision — the MATCHING rule with the LONGEST
    // pattern wins, Allow beats Disallow on ties, no match ⇒ allowed.
    // Rules per domain are file-sized (broadcast); the decision is
    // one broadcast prefix-match join + a per-URL argmax collapsed as
    // max(struct(pattern_len, is_allow)) in the partial aggregate —
    // the frontier never shuffles against anything corpus-sized.
    // Robots text is integer-derived per domain and mirrored verbatim
    // in the oracle (the q157/q169 planted-fixture discipline).
    "q237_robots_txt" -> { (s, d) =>
      import s.implicits._
      val robots = (0 until 10).map { i =>
        val lines = Seq("User-agent: *", "Disallow: /private") ++
          (if (i % 2 == 0) Seq("Allow: /private/public") else Nil) ++
          (if (i % 3 == 0) Seq("Disallow: /tmp") else Nil)
        (s"d$i", lines.mkString("\n"))
      }.toDF("domain", "robots_txt")
      val rules = robots
        .select(col("domain"),
          explode(split(col("robots_txt"), "\n")).as("line"))
        .withColumn("is_allow",
          when(col("line").startsWith("Allow: "), lit(1))
            .when(col("line").startsWith("Disallow: "), lit(0)))
        .filter(col("is_allow").isNotNull)
        .withColumn("pattern",
          regexp_replace(col("line"), "^(Allow|Disallow): ", ""))
        .select(col("domain"), col("pattern"), col("is_allow"))
      val urls = Tables.documents(s, d).select(col("doc_id"),
        concat(lit("d"), (col("doc_id") % 10).cast("string")).as("domain"),
        concat(element_at(array(lit("/private/public/p"), lit("/private/s"),
          lit("/tmp/t"), lit("/page/")), (col("doc_id") % 4).cast("int") + 1),
          col("doc_id").cast("string")).as("path"))
      val matched = urls.join(broadcast(rules),
        urls("domain") === rules("domain") &&
          col("path").startsWith(col("pattern")))
        .groupBy(col("doc_id"))
        .agg(max(struct(length(col("pattern")).as("pl"),
          col("is_allow").as("ia"))).as("m"))
        .select(col("doc_id"), col("m")("ia").as("best_allow"))
      urls.join(matched, Seq("doc_id"), "left")
        .select(col("domain"),
          coalesce(col("best_allow"), lit(1)).as("allowed"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).as("n_urls"),
          sum(col("allowed")).cast("long").as("n_allowed"),
          (count(lit(1)) - sum(col("allowed"))).cast("long")
            .as("n_blocked"))
        .orderBy(col("domain"))
    }
  )

  /** q182 — per-DOMAIN cap APPLIED: every doc is keyed by its
    * dominant link domain (the (count, domain)-lexicographic argmax
    * over its extracted links), then each domain keeps at most `cap`
    * docs in doc_id order — the C4/RefinedWeb per-site contribution
    * cap, keyed by extraction rather than a trusted column. The
    * per-domain sequence number is the GROUPED distributed prefix sum
    * (no per-domain global window); output is the per-domain
    * kept/dropped ledger.
    */
  private def domainCapQuery(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Selection
    val cap = 20
    val dominant = WebLinks.extractLinks(linkPages(s, d), "doc_id", "page")
      .groupBy(col("doc_id"), col("domain"))
      .agg(count(lit(1)).as("dn"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("dn"), col("domain"))).as("m"))
      .select(col("doc_id"), col("m.domain").as("domain"))
    val seq = Selection.groupedPrefixSum(dominant,
      Seq(col("domain")), Seq(col("doc_id")), lit(1L))
    seq
      .withColumn("kept", (col("cum_weight") <= cap).cast("long"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).cast("long").as("n_kept"),
        (count(lit(1)) - sum(col("kept"))).cast("long").as("n_dropped"))
      .orderBy(col("domain"))
  }

  /** q184's planted table pages: doc text + a (doc_id%4+1)-row ×
    * 3-col table whose cell (r, c) is 'n/a' when (doc_id+r+c)%5=0
    * else the digits (doc_id·7 + r·3 + c) % 100 — numeric and
    * unparseable cells both exercised. Mirrored in the oracle. */
  private def tablePages(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"), lit(" <table>"),
        array_join(transform(sequence(lit(1), (col("doc_id") % 4).cast("int") + 1),
          r => concat(lit("<tr>"),
            array_join(transform(sequence(lit(1), lit(3)), c =>
              concat(lit("<td>"),
                when((col("doc_id") + r + c) % 5 === 0, lit("n/a"))
                  .otherwise(((col("doc_id") * 7 + r * 3 + c) % 100).cast("string")),
                lit("</td>"))), ""),
            lit("</tr>"))), ""),
        lit("</table>")).as("page"))

  private val tablePagesSql =
    """tpages AS (
      |  SELECT doc_id, text || ' <table>' || array_to_string(
      |    [ '<tr>' || array_to_string(
      |        [ '<td>' ||
      |          CASE WHEN (doc_id + r + c) % 5 = 0 THEN 'n/a'
      |               ELSE CAST((doc_id * 7 + r * 3 + c) % 100 AS VARCHAR) END ||
      |          '</td>'
      |          FOR c IN generate_series(1, 3) ], '') || '</tr>'
      |      FOR r IN generate_series(1, CAST(doc_id % 4 AS INT) + 1) ],
      |    '') || '</table>' AS page
      |  FROM documents
      |)""".stripMargin

  /** Deterministic html pages with planted robots meta tags —
    * mirrored verbatim in the q179 oracle. */
  private def robotsPages(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"),
      concat(lit("<html><head>"),
        when(col("doc_id") % 9 === 0,
          lit("<meta name=\"robots\" content=\"noindex,follow\">"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 3,
          lit("<meta name=\"robots\" content=\"nofollow\">"))
          .otherwise(lit("")),
        lit("</head><body><p>"), col("text"),
        lit("</p></body></html>")).as("page"))

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
        |FROM bydom GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the oracle is the FULL-SCAN manifest — hash equality with the
    // Spark-side base⊎delta merge proves the incremental path exact
    "q180_manifest_merge" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |    CAST(('0x' || substr(md5('q85:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |         % 16 AS BIGINT) AS shard,
        |    CAST(('0x' || substr(md5('ck:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |         AS BIGINT) AS ck_lo,
        |    CAST(('0x' || substr(md5('ck:' || CAST(doc_id AS VARCHAR)), 9, 8))::UBIGINT
        |         AS BIGINT) AS ck_hi
        |  FROM documents)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
        |  CAST(SUM(ck_lo) AS BIGINT) AS ids_checksum_lo,
        |  CAST(SUM(ck_hi) AS BIGINT) AS ids_checksum_hi
        |FROM k GROUP BY shard ORDER BY shard""".stripMargin,

    // q85's md5 shard arithmetic via the 0x-hex cast; checksum is the
    // order-invariant TWO-LANE 32-bit hash sum (64-bit combined
    // detection power; per-lane exact BIGINT sums ≤ 2³⁰ docs/shard)
    "q178_shard_manifest" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |    CAST(('0x' || substr(md5('q85:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |         % 16 AS BIGINT) AS shard,
        |    CAST(('0x' || substr(md5('ck:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        |         AS BIGINT) AS ck_lo,
        |    CAST(('0x' || substr(md5('ck:' || CAST(doc_id AS VARCHAR)), 9, 8))::UBIGINT
        |         AS BIGINT) AS ck_hi
        |  FROM documents)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
        |  CAST(SUM(ck_lo) AS BIGINT) AS ids_checksum_lo,
        |  CAST(SUM(ck_hi) AS BIGINT) AS ids_checksum_hi
        |FROM k GROUP BY shard ORDER BY shard""".stripMargin,

    // dominant domain = (count, domain)-lexicographic argmax;
    // cap sequence = row_number in doc order (≡ grouped prefix sum)
    "q182_domain_cap" ->
      s"""WITH $linksSql,
        |bydom AS (SELECT doc_id, domain, COUNT(*) AS dn
        |          FROM links GROUP BY 1, 2),
        |dom AS (SELECT doc_id, domain FROM (
        |          SELECT doc_id, domain,
        |            ROW_NUMBER() OVER (PARTITION BY doc_id
        |                               ORDER BY dn DESC, domain DESC) AS rn
        |          FROM bydom) WHERE rn = 1),
        |sq AS (SELECT doc_id, domain,
        |         ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS pos
        |       FROM dom)
        |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN pos <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN pos > 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM sq GROUP BY domain ORDER BY domain""".stripMargin,

    "q184_table_extract" ->
      s"""WITH $tablePagesSql,
        |rx AS (SELECT doc_id,
        |         regexp_extract_all(page, '<tr>((?:<td>[^<]*</td>)*)</tr>', 1) AS rws
        |       FROM tpages),
        |rws AS (SELECT doc_id,
        |          unnest([{'i': i - 1, 'h': rws[i]}
        |                  FOR i IN generate_series(1, len(rws))]) AS u
        |        FROM rx),
        |cx AS (SELECT doc_id, u.i AS row_idx,
        |         regexp_extract_all(u.h, '<td>([^<]*)</td>', 1) AS cs
        |       FROM rws),
        |cells AS (SELECT doc_id, row_idx,
        |            unnest([{'j': j - 1, 'c': cs[j]}
        |                    FOR j IN generate_series(1, len(cs))]) AS v
        |          FROM cx)
        |SELECT doc_id, CAST(row_idx AS INT) AS row_idx,
        |  CAST(v.j AS INT) AS col_idx, v.c AS cell,
        |  CASE WHEN regexp_full_match(v.c, '[0-9]+')
        |       THEN CAST(v.c AS BIGINT) END AS val_int
        |FROM cells ORDER BY doc_id, row_idx, col_idx""".stripMargin,

    "q179_robots_audit" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    '<html><head>' ||
        |    CASE WHEN doc_id % 9 = 0
        |         THEN '<meta name="robots" content="noindex,follow">' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 3
        |         THEN '<meta name="robots" content="nofollow">' ELSE '' END ||
        |    '</head><body><p>' || text || '</p></body></html>' AS page
        |  FROM documents),
        |r AS (SELECT doc_id,
        |        lower(regexp_extract(page,
        |          '(?i)<meta[^>]*name="robots"[^>]*content="([^"]*)"', 1)) AS robots
        |      FROM p),
        |f AS (SELECT doc_id,
        |        CASE WHEN robots LIKE '%noindex%' THEN 1 ELSE 0 END AS noindex,
        |        CASE WHEN robots LIKE '%nofollow%' THEN 1 ELSE 0 END AS nofollow
        |      FROM r)
        |SELECT CASE WHEN noindex = 1 THEN 'drop' ELSE 'keep' END AS verdict,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(noindex) AS BIGINT) AS n_noindex,
        |  CAST(SUM(nofollow) AS BIGINT) AS n_nofollow
        |FROM f GROUP BY 1 ORDER BY verdict""".stripMargin,

    // mirror of WebLinks.canonicalizeUrls: scheme/www/fragment strip,
    // utm* params dropped, survivors sorted, trailing slash strip
    "q211_url_canonical" ->
      s"""WITH $linkPagesSql,
        |raw AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(page, '(?i)https?://[a-z0-9.-]+(?:/[^ "<>]*)?'))
        |      AS u
        |  FROM pages),
        |s1 AS (
        |  SELECT regexp_replace(regexp_replace(u, '(?i)^https?://', ''),
        |                        '#.*$$', '') AS nofrag
        |  FROM raw),
        |s2 AS (
        |  SELECT regexp_extract(nofrag, '^([^?]*)', 1) AS hostpath,
        |         regexp_extract(nofrag, '\\?(.*)$$', 1) AS qs
        |  FROM s1),
        |s3 AS (
        |  SELECT
        |    regexp_replace(lower(regexp_extract(hostpath, '^([^/:]+)', 1)),
        |                   '^www\\.', '') AS host,
        |    regexp_replace(coalesce(regexp_extract(hostpath, '^[^/]*(/.*)?$$', 1), ''),
        |                   '/$$', '') AS path,
        |    array_to_string(list_sort(
        |      [p FOR p IN string_split(qs, '&') IF p <> '' AND p NOT LIKE 'utm%']),
        |      '&') AS keep
        |  FROM s2),
        |c AS (
        |  SELECT host AS canonical_host, host || path ||
        |    CASE WHEN keep <> '' THEN '?' || keep ELSE '' END AS canonical
        |  FROM s3)
        |SELECT canonical_host, CAST(COUNT(*) AS BIGINT) AS n_urls,
        |  CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_canonical,
        |  CAST(COUNT(*) - COUNT(DISTINCT canonical) AS BIGINT) AS dup_extra,
        |  ROUND(CAST(COUNT(*) - COUNT(DISTINCT canonical) AS DOUBLE)
        |    / COUNT(*), 6) AS dup_rate
        |FROM c GROUP BY canonical_host ORDER BY canonical_host""".stripMargin,

    "q216_recrawl_delta" ->
      s"""WITH w AS (SELECT doc_id, source, ${TextQueries.wsSql} AS ws
         |           FROM documents),
         |oldw AS (SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN
         |      [CASE WHEN (i-1) % 11 = 0 THEN 'upd' ELSE ws[i] END
         |       FOR i IN generate_series(1, len(ws))]
         |    ELSE ws END AS ws
         |  FROM w WHERE doc_id % 17 <> 0),
         |shn AS (SELECT DISTINCT doc_id,
         |    unnest([array_to_string(ws[i:i+2],' ')
         |            FOR i IN generate_series(1, len(ws)-2)]) AS sh
         |  FROM w WHERE len(ws) >= 3),
         |sho AS (SELECT DISTINCT doc_id,
         |    unnest([array_to_string(ws[i:i+2],' ')
         |            FOR i IN generate_series(1, len(ws)-2)]) AS sh
         |  FROM oldw WHERE len(ws) >= 3),
         |cn AS (SELECT doc_id, COUNT(*) AS n FROM shn GROUP BY 1),
         |co AS (SELECT doc_id, COUNT(*) AS n FROM sho GROUP BY 1),
         |inter AS (SELECT x.doc_id, COUNT(*) AS ni
         |          FROM shn x JOIN sho y ON y.doc_id = x.doc_id AND y.sh = x.sh
         |          GROUP BY 1),
         |j AS (SELECT cn.doc_id,
         |        (COALESCE(i.ni, 0) * 2000000
         |           + (cn.n + co.n - COALESCE(i.ni, 0)))
         |          // ((cn.n + co.n - COALESCE(i.ni, 0)) * 2) AS j_u
         |      FROM cn JOIN co USING (doc_id) LEFT JOIN inter i USING (doc_id)),
         |cls AS (SELECT w.source,
         |      CASE WHEN j.j_u IS NULL THEN 'new'
         |           WHEN j.j_u = 1000000 THEN 'unchanged'
         |           WHEN j.j_u >= 500000 THEN 'minor'
         |           ELSE 'major' END AS status,
         |      j.j_u
         |    FROM w LEFT JOIN j USING (doc_id))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pages,
         |  CAST(SUM(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new,
         |  CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unchanged,
         |  CAST(SUM(CASE WHEN status = 'minor' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_minor,
         |  CAST(SUM(CASE WHEN status = 'major' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_major,
         |  ROUND(AVG(j_u) / 1000000, 6) AS mean_jaccard
         |FROM cls GROUP BY source ORDER BY source""".stripMargin,

    "q237_robots_txt" ->
      """WITH robots AS (
        |  SELECT 'd' || CAST(i AS VARCHAR) AS domain,
        |    'User-agent: *' || chr(10) || 'Disallow: /private' ||
        |    CASE WHEN i % 2 = 0
        |         THEN chr(10) || 'Allow: /private/public' ELSE '' END ||
        |    CASE WHEN i % 3 = 0
        |         THEN chr(10) || 'Disallow: /tmp' ELSE '' END AS robots_txt
        |  FROM generate_series(0, 9) t(i)),
        |lines AS (SELECT domain,
        |            unnest(string_split(robots_txt, chr(10))) AS line
        |          FROM robots),
        |rules AS (
        |  SELECT domain,
        |    CASE WHEN starts_with(line, 'Allow: ') THEN 1 ELSE 0 END
        |      AS is_allow,
        |    regexp_replace(line, '^(Allow|Disallow): ', '') AS pattern
        |  FROM lines
        |  WHERE starts_with(line, 'Allow: ')
        |     OR starts_with(line, 'Disallow: ')),
        |urls AS (
        |  SELECT doc_id, 'd' || CAST(doc_id % 10 AS VARCHAR) AS domain,
        |    ['/private/public/p','/private/s','/tmp/t','/page/']
        |      [CAST(doc_id % 4 AS INT) + 1] || CAST(doc_id AS VARCHAR)
        |      AS path
        |  FROM documents),
        |matched AS (
        |  SELECT u.doc_id, r.is_allow, len(r.pattern) AS pl
        |  FROM urls u JOIN rules r
        |    ON u.domain = r.domain AND starts_with(u.path, r.pattern)),
        |best AS (
        |  SELECT doc_id, is_allow FROM (
        |    SELECT doc_id, is_allow,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY pl DESC, is_allow DESC) AS rn
        |    FROM matched) WHERE rn = 1),
        |verd AS (
        |  SELECT u.domain, COALESCE(b.is_allow, 1) AS allowed
        |  FROM urls u LEFT JOIN best b USING (doc_id))
        |SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls,
        |  CAST(SUM(allowed) AS BIGINT) AS n_allowed,
        |  CAST(COUNT(*) - SUM(allowed) AS BIGINT) AS n_blocked
        |FROM verd GROUP BY domain ORDER BY domain""".stripMargin
  )
}
