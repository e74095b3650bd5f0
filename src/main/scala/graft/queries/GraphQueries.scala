package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** SURVEY.md §2.3 graph analytics (beyond CC/PageRank): triangle
  * counting and single-source BFS, both derived from a deterministic
  * edge set over the orders table so they oracle-check exactly — the
  * reference's STRING PPI network (tidy-api-ftp.R:147-162) is exactly
  * such an edge table, and neighbourhood statistics over it are the
  * natural next query a user asks.
  *
  * Edge construction: (o_custkey % N) — (o_orderkey % N), sampled by
  * orderkey so density stays bounded as SF grows.
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Canonical undirected (a < b) edges, sampled 1-in-10 orders. */
  private def sampledEdges(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 10 === 1)
      .select((col("o_custkey") % 200).as("a"), (col("o_orderkey") % 200).as("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") < col("b"))

  /** Directed edges on the full orders table (BFS reachability). */
  private def directedEdges(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select((col("o_custkey") % 200).as("src"), (col("o_orderkey") % 200).as("dst"))
      .filter(col("src") =!= col("dst"))

  val queries: Map[String, Q] = Map(

    // per-node triangle participation (ordered three-way self-join)
    "q93_triangles" -> { (s, d) =>
      Graph.triangleCounts(sampledEdges(s, d)).orderBy(col("id"))
    },

    // min hop distance from node 0, paths of ≤ 8 edges
    "q94_bfs" -> { (s, d) =>
      Graph.bfs(directedEdges(s, d), source = 0L, maxDepth = 8)
        .orderBy(col("id"))
    },

    // §2.3 (round 13) — synchronous LABEL-PROPAGATION communities
    // (Raghavan'07; the GraphFrames/Pregel deterministic variant):
    // CC (q59) answers "which nodes touch at all"; LPA finds DENSE
    // regions inside one component — the domain-cluster signal the
    // curation family groups by when no labels exist. Three
    // synchronous rounds, mode-of-neighbors with min-label ties (no
    // randomness, no async order-dependence); each round is the
    // PageRank-shaped label join + two partial-agg groupBys with the
    // mode as max(struct(count, −label)) — no window, no sort.
    // Oracled by three unrolled mode-CTEs in DuckDB.
    "q233_label_propagation" -> { (s, d) =>
      Graph.labelPropagation(sampledEdges(s, d), iters = 3)
        .orderBy(col("id"))
    },

    // §2.3 (round 14) — HITS hubs & authorities (Kleinberg '99): the
    // link-analysis dual of PageRank (q91). On a crawl graph, hub
    // scores find link farms / directory pages and authority scores
    // find canonical sources — both feed the web-curation family
    // (domain caps q182, robots q179). Two EXACT integer rounds, one
    // terminal max-normalization division — see Graph.hits.
    "q243_hits" -> { (s, d) =>
      Graph.hits(directedEdges(s, d), iters = 2).orderBy(col("id"))
    },

    // §2.3 (round 14) — k-core decomposition (Seidman '83) by
    // synchronous peeling: the maximal subgraph of min degree ≥ 3.
    // CC (q59) says "connected at all", LPA (q233) finds dense
    // regions; the k-core is the standard cohesion FILTER before
    // either — and peel depth is the graph's degeneracy, the quantity
    // that bounds triangle/clique costs. 8 unrolled rounds (spec
    // asserts round 9 is a no-op), oracled by 8 peel CTEs.
    "q244_kcore" -> { (s, d) =>
      Graph.kCore(sampledEdges(s, d), k = 3, rounds = 8)
        .orderBy(col("id"))
    },

    // §2.3 (round 15) — LINK PREDICTION (Adamic–Adar / Jaccard /
    // common neighbors) for every non-adjacent distance-2 pair: on
    // the reference's STRING PPI table this is "which unlinked gene
    // pairs share the most interaction partners" — the standard
    // network-completion query. Wedge self-join + partial-agg
    // groupBy + edge anti-join; AA terms decimal-quantized so the
    // sum is partition-order-independent. Pairs with ≥ 2 common
    // neighbors (the score floor a completion pipeline acts on).
    // The oracle mirrors the maxFanout=256 lowest-id-neighbor hub
    // cap (symc QUALIFY), so parity holds even on a graph whose max
    // degree exceeds the cap — not just because the %200 test
    // graph's degrees happen to stay under it.
    "q297_link_prediction" -> { (s, d) =>
      Graph.linkPrediction(sampledEdges(s, d))
        .filter(col("common_neighbors") >= 2)
        .orderBy(col("u"), col("w"))
    },

    // §2.3 (round 15) — DEGREE ASSORTATIVITY (Newman PRL'02): the
    // Pearson correlation of endpoint degrees over the symmetric
    // edge orientation — one number that tells a crawl-curation
    // pipeline whether this snapshot's topology is social-like
    // (r > 0) or link-farm/hub-and-spoke (r < 0); logged next to
    // triangle count (q93) and degeneracy (q244) per crawl. All
    // moments exact BIGINTs, one terminal IEEE division.
    "q298_assortativity" -> { (s, d) =>
      Graph.assortativity(sampledEdges(s, d))
    }
  )

  val oracleSql: Map[String, String] = Map(

    "q93_triangles" ->
      """WITH pairs AS (
        |  SELECT LEAST(o_custkey % 200, o_orderkey % 200) AS a,
        |         GREATEST(o_custkey % 200, o_orderkey % 200) AS b
        |  FROM orders WHERE o_orderkey % 10 = 1
        |), e AS (
        |  SELECT DISTINCT a, b FROM pairs WHERE a < b
        |), tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |)
        |SELECT id, COUNT(*) AS n_triangles FROM (
        |  SELECT x AS id FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri
        |) GROUP BY id ORDER BY id""".stripMargin,

    "q94_bfs" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT o_custkey % 200 AS src, o_orderkey % 200 AS dst
        |  FROM orders WHERE o_custkey % 200 <> o_orderkey % 200
        |), r(id, d) AS (
        |  SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d
        |  UNION
        |  SELECT e.dst, r.d + 1 FROM r JOIN e ON e.src = r.id WHERE r.d < 8
        |)
        |SELECT id, MIN(d) AS dist_hops FROM r GROUP BY id ORDER BY id""".stripMargin,

    "q233_label_propagation" -> {
      val iterCtes = (1 to 3).map { i =>
        s"""l$i AS (
           |  SELECT u AS id, lbl FROM (
           |    SELECT u, lbl,
           |      row_number() OVER (PARTITION BY u
           |        ORDER BY c DESC, lbl ASC) AS rn
           |    FROM (SELECT s.u, p.lbl, COUNT(*) AS c
           |          FROM sym s JOIN l${i - 1} p ON s.v = p.id
           |          GROUP BY s.u, p.lbl))
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT LEAST(o_custkey % 200, o_orderkey % 200) AS a,
         |         GREATEST(o_custkey % 200, o_orderkey % 200) AS b
         |  FROM orders WHERE o_orderkey % 10 = 1
         |), e AS (SELECT DISTINCT a, b FROM pairs WHERE a < b),
         |sym AS (SELECT a AS u, b AS v FROM e
         |        UNION ALL SELECT b, a FROM e),
         |l0 AS (SELECT DISTINCT u AS id, u AS lbl FROM sym),
         |$iterCtes
         |SELECT id, lbl FROM l3 ORDER BY id""".stripMargin
    },

    "q243_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT o_custkey % 200 AS src, o_orderkey % 200 AS dst
        |  FROM orders WHERE o_custkey % 200 <> o_orderkey % 200
        |), n AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |a1 AS (SELECT dst AS id, CAST(COUNT(*) AS BIGINT) AS a
        |       FROM e GROUP BY dst),
        |h1 AS (SELECT e.src AS id, CAST(SUM(a1.a) AS BIGINT) AS h
        |       FROM e JOIN a1 ON e.dst = a1.id GROUP BY e.src),
        |a2 AS (SELECT e.dst AS id, CAST(SUM(h1.h) AS BIGINT) AS a
        |       FROM e JOIN h1 ON e.src = h1.id GROUP BY e.dst),
        |h2 AS (SELECT e.src AS id, CAST(SUM(a2.a) AS BIGINT) AS h
        |       FROM e JOIN a2 ON e.dst = a2.id GROUP BY e.src),
        |m AS (SELECT (SELECT MAX(a) FROM a2) AS ma,
        |             (SELECT MAX(h) FROM h2) AS mh)
        |SELECT n.id, COALESCE(a2.a, 0) AS auth, COALESCE(h2.h, 0) AS hub,
        |  ROUND(CAST(COALESCE(a2.a, 0) AS DOUBLE) / m.ma, 6) AS auth_norm,
        |  ROUND(CAST(COALESCE(h2.h, 0) AS DOUBLE) / m.mh, 6) AS hub_norm
        |FROM n LEFT JOIN a2 ON n.id = a2.id LEFT JOIN h2 ON n.id = h2.id
        |CROSS JOIN m ORDER BY n.id""".stripMargin,

    "q244_kcore" -> {
      val peels = (1 to 8).map { i =>
        s"""d$i AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS c
           |  FROM sym JOIN s${i - 1} x ON sym.u = x.id
           |           JOIN s${i - 1} y ON sym.v = y.id
           |  GROUP BY u),
           |s$i AS (SELECT u AS id FROM d$i WHERE c >= 3)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS (
         |  SELECT LEAST(o_custkey % 200, o_orderkey % 200) AS a,
         |         GREATEST(o_custkey % 200, o_orderkey % 200) AS b
         |  FROM orders WHERE o_orderkey % 10 = 1
         |), e AS (SELECT DISTINCT a, b FROM pairs WHERE a < b),
         |sym AS (SELECT a AS u, b AS v FROM e
         |        UNION ALL SELECT b, a FROM e),
         |s0 AS (SELECT DISTINCT u AS id FROM sym),
         |$peels,
         |df AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM sym JOIN s8 x ON sym.u = x.id JOIN s8 y ON sym.v = y.id
         |  GROUP BY u)
         |SELECT u AS id, c AS core_deg FROM df ORDER BY id""".stripMargin
    },

    "q297_link_prediction" ->
      """WITH pairs AS (
        |  SELECT LEAST(o_custkey % 200, o_orderkey % 200) AS a,
        |         GREATEST(o_custkey % 200, o_orderkey % 200) AS b
        |  FROM orders WHERE o_orderkey % 10 = 1
        |), e AS (SELECT DISTINCT a, b FROM pairs WHERE a < b),
        |sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |symc AS (
        |  SELECT u, v FROM sym
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY v ORDER BY u) <= 256),
        |wed AS (
        |  SELECT l.u AS u, r.u AS w, d.deg AS zdeg
        |  FROM symc l JOIN symc r ON l.v = r.v AND l.u < r.u
        |  JOIN deg d ON d.u = l.v),
        |sc AS (
        |  SELECT u, w, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
        |    SUM(CAST(ROUND(1.0 / ln(CAST(zdeg AS DOUBLE)), 12)
        |        AS DECIMAL(18,12))) AS aa
        |  FROM wed GROUP BY u, w),
        |nc AS (SELECT sc.* FROM sc LEFT JOIN e
        |       ON e.a = sc.u AND e.b = sc.w WHERE e.a IS NULL)
        |SELECT nc.u, nc.w, common_neighbors,
        |  ROUND(CAST(common_neighbors AS DOUBLE)
        |    / CAST(du.deg + dw.deg - common_neighbors AS DOUBLE), 6) AS jaccard,
        |  ROUND(CAST(aa AS DOUBLE), 6) AS adamic_adar
        |FROM nc JOIN deg du ON du.u = nc.u JOIN deg dw ON dw.u = nc.w
        |WHERE common_neighbors >= 2
        |ORDER BY nc.u, nc.w""".stripMargin,

    "q298_assortativity" ->
      """WITH pairs AS (
        |  SELECT LEAST(o_custkey % 200, o_orderkey % 200) AS a,
        |         GREATEST(o_custkey % 200, o_orderkey % 200) AS b
        |  FROM orders WHERE o_orderkey % 10 = 1
        |), e AS (SELECT DISTINCT a, b FROM pairs WHERE a < b),
        |sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg
        |        FROM sym GROUP BY u),
        |j AS (SELECT du.deg AS d1, dv.deg AS d2
        |      FROM sym s JOIN deg du ON du.u = s.u
        |                 JOIN deg dv ON dv.u = s.v),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
        |  CAST(SUM(d1) AS BIGINT) AS s1,
        |  CAST(SUM(d1 * d1) AS BIGINT) AS s11,
        |  CAST(SUM(d1 * d2) AS BIGINT) AS s12 FROM j)
        |SELECT m2, ROUND(CAST(s1 AS DOUBLE) / m2, 6) AS mean_end_deg,
        |  ROUND(CAST(m2 * s12 - s1 * s1 AS DOUBLE)
        |    / CAST(m2 * s11 - s1 * s1 AS DOUBLE), 6) AS assortativity
        |FROM m""".stripMargin
  )
}
