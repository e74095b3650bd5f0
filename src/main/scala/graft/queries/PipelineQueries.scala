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
