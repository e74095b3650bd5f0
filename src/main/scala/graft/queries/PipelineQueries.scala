package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.AnnotationPipeline

/** SURVEY.md §2.1 #13 (explicit unpivot) + the composed flagship
  * pipeline (#5/#8/#9 assembled end-to-end as the reference does).
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // matrix→long: unpivot the per-customer status-count matrix back
    // to tidy long form (DepMap t()+rowSums inverse, tidy-web.R:12-26).
    "q26_unpivot" -> { (s, d) =>
      ReferenceQueries.queries("q12_pivot_wider")(s, d)
        .unpivot(
          ids = Array(col("o_custkey")),
          values = Array(col("n_f"), col("n_o"), col("n_p")),
          variableColumnName = "status",
          valueColumnName = "n")
        .orderBy(col("o_custkey"), col("status"))
    },

    // the reference's end shape: key universe × N tidied sources →
    // one wide annotation row per entity.
    "q27_annotation_pipeline" -> { (s, d) =>
      AnnotationPipeline.buildAnnotations(s, d).orderBy(col("c_custkey"))
    },

    // round-10 stretch: ALL ~20 reference source families tidied with
    // their exact verb sequences (AnnotationPipeline.sources) and
    // assembled into one wide row per template key — the "a reference
    // user could switch" claim, demonstrated AND oracled in one call.
    // Scalar families join wide; multi-row annotation families join
    // as per-key counts (the reference keeps those long).
    "q189_annotate_genes" -> { (s, d) =>
      AnnotationPipeline.annotateGenes(s, d).orderBy(col("c_custkey"))
    },

    // GO-shape pivot round trip (tidy-api-ftp.R:293-323): pivot_wider
    // with values_fn = list (collect_list per cell), then unnest the
    // list cells back to long form with a position index. The wide
    // stage holds ARRAY cells, not scalars — the shape the GO BP/MF/CC
    // annotation tables take in the reference.
    "q68_pivot_unnest" -> { (s, d) =>
      val statuses = Seq("O", "F", "P")
      val wide = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .pivot("o_orderstatus", statuses)
        .agg(sort_array(collect_list(col("o_orderkey"))))
      wide.select(col("o_custkey"),
          explode(array(statuses.map(st =>
            struct(lit(st).as("status"),
              coalesce(col(st), array().cast("array<bigint>")).as("ks"))): _*)).as("e"))
        .select(col("o_custkey"), col("e.status").as("status"),
          posexplode(col("e.ks")))
        .select(col("o_custkey"), col("status"),
          (col("pos") + 1).cast("long").as("idx"), col("col").as("o_orderkey"))
        .orderBy(col("o_custkey"), col("status"), col("idx"))
    }
  )

  val oracleSql: Map[String, String] = Map(

    // every CTE mirrors one AnnotationPipeline.sources family
    "q189_annotate_genes" ->
      """WITH template AS (SELECT DISTINCT c_custkey FROM customer),
        |gene_ids AS (
        |  SELECT c_custkey, NULLIF(c_name, '') AS entity_name,
        |         NULLIF(CAST(c_nationkey AS VARCHAR), '') AS nation_id,
        |         NULLIF(c_mktsegment, '') AS segment_id
        |  FROM customer),
        |alias_n AS (
        |  SELECT o_custkey AS c_custkey,
        |         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_alias_names
        |  FROM orders GROUP BY 1),
        |pos_len AS (
        |  SELECT o_custkey AS c_custkey, MIN(o_orderdate) AS start_date,
        |         MAX(o_orderdate) AS end_date,
        |         CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) + 1 AS INT)
        |           AS span_days
        |  FROM orders WHERE o_orderstatus IN ('F','O','P') GROUP BY 1),
        |gc AS (
        |  SELECT o_custkey AS c_custkey,
        |         ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |           * 100 / COUNT(*), 3) AS pct_discount
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1),
        |panther_n AS (
        |  SELECT o_custkey AS c_custkey,
        |         CAST(COUNT(DISTINCT upper(substr(p_type, 1, 1)) ||
        |           lower(substr(p_type, 2))) AS BIGINT) AS n_panther_classes
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  JOIN part ON l_partkey = p_partkey GROUP BY 1),
        |supps AS (SELECT DISTINCT o_custkey, l_suppkey
        |          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |ppi_n AS (
        |  SELECT a.o_custkey AS c_custkey,
        |         CAST(COUNT(DISTINCT b.o_custkey) AS BIGINT) AS n_string_ppi
        |  FROM supps a JOIN supps b
        |    ON a.l_suppkey = b.l_suppkey AND a.o_custkey < b.o_custkey
        |  GROUP BY 1),
        |impc_sing AS (
        |  SELECT l_orderkey, MIN(l_returnflag) AS flag FROM lineitem
        |  GROUP BY 1 HAVING COUNT(DISTINCT l_returnflag) = 1),
        |impc_v AS (
        |  SELECT o_custkey AS c_custkey, MIN(flag) AS impc_viability
        |  FROM orders JOIN impc_sing ON o_orderkey = l_orderkey
        |  GROUP BY 1 HAVING COUNT(DISTINCT flag) = 1),
        |impc_p_n AS (
        |  SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_impc_phenotypes FROM (
        |    SELECT DISTINCT o_custkey AS c_custkey, l_linestatus, l_returnflag
        |    FROM orders JOIN lineitem ON o_orderkey = l_orderkey) GROUP BY 1),
        |mgi AS (
        |  SELECT o_custkey AS c_custkey,
        |         CASE WHEN bool_or(l_returnflag = 'R') THEN 'lethal'
        |              ELSE 'viable' END AS viability_mgi
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1),
        |go_n AS (
        |  SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_go_annotations
        |  FROM orders GROUP BY 1),
        |reactome_n AS (
        |  SELECT o_custkey AS c_custkey,
        |         CAST(COUNT(DISTINCT regexp_replace(o_orderpriority, '^[0-9]-', ''))
        |           AS BIGINT) AS n_reactome
        |  FROM orders WHERE regexp_matches(o_orderpriority, '^[0-9]-') GROUP BY 1),
        |omim_n AS (
        |  SELECT o_custkey AS c_custkey, CAST(2 * COUNT(*) AS BIGINT) AS n_omim_genemap
        |  FROM orders GROUP BY 1),
        |lethality AS (
        |  SELECT c_custkey, NULLIF(CASE cat
        |      WHEN '1-URGENT' THEN 'L1; Prenatal death'
        |      WHEN '2-HIGH' THEN 'L2; Neonatal death'
        |      WHEN '3-MEDIUM' THEN 'L3; Death in infancy'
        |      WHEN '4-NOT SPECIFIED' THEN 'LU; Not determined'
        |      WHEN '5-LOW' THEN 'NL; Non lethal'
        |      ELSE cat END, '-') AS earliest_lethality_category
        |  FROM (SELECT o_custkey AS c_custkey, MIN(o_orderpriority) AS cat
        |        FROM orders GROUP BY 1)),
        |panelapp AS (
        |  SELECT c_custkey,
        |    CASE conf WHEN 3 THEN 'green' WHEN 2 THEN 'amber'
        |              WHEN 1 THEN 'red' END AS confidence_level,
        |    mode_of_inheritance
        |  FROM (SELECT o_custkey AS c_custkey, MIN(o_orderkey) % 3 + 1 AS conf,
        |               MIN(o_orderstatus) AS mode_of_inheritance
        |        FROM orders GROUP BY 1)),
        |orthologs AS (
        |  SELECT c_custkey, n_name AS ortholog_mapping,
        |         n_regionkey AS ortholog_region
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |paralogs_n AS (
        |  SELECT c_custkey, CAST(cnt - 1 AS BIGINT) AS n_paralogs FROM (
        |    SELECT c_custkey,
        |           COUNT(*) OVER (PARTITION BY c_mktsegment, c_nationkey) AS cnt
        |    FROM customer) WHERE cnt > 1),
        |dep AS (
        |  SELECT o_custkey AS c_custkey,
        |    ROUND(CAST(100 * SUM(CASE WHEN l_quantity <= 10.0 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / COUNT(*), 3) AS percentage_essential,
        |    ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*), 3) AS mean_score_all
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1),
        |mane_n AS (
        |  SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_mane_constraint FROM (
        |    SELECT o_custkey AS c_custkey, o_orderstatus,
        |           COUNT(*) OVER (PARTITION BY o_custkey) AS n
        |    FROM orders) WHERE n = 1 OR o_orderstatus = 'O' GROUP BY 1),
        |gwas_n AS (
        |  SELECT c_custkey, CAST(COUNT(DISTINCT t) AS BIGINT) AS n_gwas_traits FROM (
        |    SELECT o_custkey AS c_custkey, o_orderpriority AS t FROM orders
        |    UNION
        |    SELECT o_custkey, o_orderstatus FROM orders) GROUP BY 1),
        |manuscript AS (
        |  SELECT c_custkey, score,
        |         ntile(10) OVER (PARTITION BY segment ORDER BY score, c_custkey)
        |           AS decile
        |  FROM (SELECT c_custkey, c_mktsegment AS segment,
        |               ROUND(c_acctbal, 3) AS score FROM customer))
        |SELECT t.c_custkey,
        |  alias_n.n_alias_names, dep.percentage_essential, dep.mean_score_all,
        |  gc.pct_discount, gene_ids.entity_name, gene_ids.nation_id,
        |  gene_ids.segment_id, go_n.n_go_annotations, gwas_n.n_gwas_traits,
        |  impc_p_n.n_impc_phenotypes, impc_v.impc_viability,
        |  lethality.earliest_lethality_category, mane_n.n_mane_constraint,
        |  manuscript.score, manuscript.decile, mgi.viability_mgi,
        |  omim_n.n_omim_genemap, orthologs.ortholog_mapping,
        |  orthologs.ortholog_region, panelapp.confidence_level,
        |  panelapp.mode_of_inheritance, panther_n.n_panther_classes,
        |  paralogs_n.n_paralogs, pos_len.start_date, pos_len.end_date,
        |  pos_len.span_days, reactome_n.n_reactome, ppi_n.n_string_ppi
        |FROM template t
        |LEFT JOIN gene_ids ON gene_ids.c_custkey = t.c_custkey
        |LEFT JOIN alias_n ON alias_n.c_custkey = t.c_custkey
        |LEFT JOIN pos_len ON pos_len.c_custkey = t.c_custkey
        |LEFT JOIN gc ON gc.c_custkey = t.c_custkey
        |LEFT JOIN panther_n ON panther_n.c_custkey = t.c_custkey
        |LEFT JOIN ppi_n ON ppi_n.c_custkey = t.c_custkey
        |LEFT JOIN impc_v ON impc_v.c_custkey = t.c_custkey
        |LEFT JOIN impc_p_n ON impc_p_n.c_custkey = t.c_custkey
        |LEFT JOIN mgi ON mgi.c_custkey = t.c_custkey
        |LEFT JOIN go_n ON go_n.c_custkey = t.c_custkey
        |LEFT JOIN reactome_n ON reactome_n.c_custkey = t.c_custkey
        |LEFT JOIN omim_n ON omim_n.c_custkey = t.c_custkey
        |LEFT JOIN lethality ON lethality.c_custkey = t.c_custkey
        |LEFT JOIN panelapp ON panelapp.c_custkey = t.c_custkey
        |LEFT JOIN orthologs ON orthologs.c_custkey = t.c_custkey
        |LEFT JOIN paralogs_n ON paralogs_n.c_custkey = t.c_custkey
        |LEFT JOIN dep ON dep.c_custkey = t.c_custkey
        |LEFT JOIN mane_n ON mane_n.c_custkey = t.c_custkey
        |LEFT JOIN gwas_n ON gwas_n.c_custkey = t.c_custkey
        |LEFT JOIN manuscript ON manuscript.c_custkey = t.c_custkey
        |ORDER BY t.c_custkey""".stripMargin,

    "q26_unpivot" ->
      """SELECT o_custkey, status, n FROM (
        |  SELECT o_custkey, 'n_f' AS status,
        |         COUNT(*) FILTER (o_orderstatus = 'F') AS n FROM orders GROUP BY o_custkey
        |  UNION ALL
        |  SELECT o_custkey, 'n_o' AS status,
        |         COUNT(*) FILTER (o_orderstatus = 'O') AS n FROM orders GROUP BY o_custkey
        |  UNION ALL
        |  SELECT o_custkey, 'n_p' AS status,
        |         COUNT(*) FILTER (o_orderstatus = 'P') AS n FROM orders GROUP BY o_custkey)
        |ORDER BY o_custkey, status""".stripMargin,

    // pivot(list)+unnest ≡ row_number within (key, pivot-col) over the
    // sorted collect_list — the round trip is the identity with a
    // position column.
    "q68_pivot_unnest" ->
      """SELECT o_custkey, o_orderstatus AS status,
        |       row_number() OVER (PARTITION BY o_custkey, o_orderstatus
        |                          ORDER BY o_orderkey) AS idx,
        |       o_orderkey
        |FROM orders
        |ORDER BY o_custkey, status, idx""".stripMargin,

    "q27_annotation_pipeline" ->
      """WITH template AS (SELECT DISTINCT c_custkey FROM customer),
        |ident AS (
        |  SELECT c_custkey, c_name, c_mktsegment, n_name AS nation
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |ostats AS (
        |  SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |         MAX(o_orderdate) AS last_order
        |  FROM orders GROUP BY 1),
        |prio AS (
        |  SELECT o_custkey AS c_custkey, MIN(o_orderpriority) AS sole_priority
        |  FROM orders GROUP BY 1
        |  HAVING COUNT(DISTINCT o_orderpriority) = 1),
        |flags AS (
        |  SELECT o_custkey AS c_custkey,
        |         string_agg(DISTINCT l_returnflag, '|' ORDER BY l_returnflag) AS return_flags
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1)
        |SELECT DISTINCT t.c_custkey AS c_custkey, i.c_name, i.c_mktsegment, i.nation,
        |       o.n_orders, o.total_spend, o.last_order, p.sole_priority, f.return_flags
        |FROM template t
        |LEFT JOIN ident  i USING (c_custkey)
        |LEFT JOIN ostats o USING (c_custkey)
        |LEFT JOIN prio   p USING (c_custkey)
        |LEFT JOIN flags  f USING (c_custkey)
        |ORDER BY c_custkey""".stripMargin
  )
}
