package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.RelationalOps._

/** SURVEY.md §2.1 — relational core (the dplyr verb surface of the
  * reference pipeline), exercised on the driver's TPC-H-ish tables.
  *
  * Determinism rules (SURVEY.md §5): additive money aggregates go
  * through DECIMAL (exact, associative ⇒ identical under any
  * partitioning and identical to the DuckDB oracle), then cast to
  * DOUBLE for a stable wire type.
  */
object CoreQueries {

  /** Exact 2-dp decimal view of a money/quantity double column. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  /** Exact decimal sum surfaced as double. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // §2.1 #1,2,7,21 — scan + filter pushdown + group-agg. TPC-H Q1
    // shape; mirrors the reference's per-gene summarise passes.
    "q01_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"),
          round(dsum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // §2.1 #6,7 — multi-way join (broadcast dims) + agg. The id-bridge
    // join chain of the reference (symbol↔ensembl↔uniprot) in TPC-H
    // clothing: customer⋈nation⋈orders⋈lineitem.
    "q02_revenue_by_nation" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o  = Tables.orders(s, d)
      val c  = Tables.customer(s, d)
      val n  = Tables.nation(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },

    // §2.1 #7 — group-by with count + count distinct (the reference's
    // `count(gene_symbol)` conflict audits).
    "q03_priority_counts" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          dsum(col("o_totalprice")).as("total_price"))
        .orderBy(col("o_orderpriority"))
    },

    // §2.1 #3 — filter: %in% set membership + regex grepl + range,
    // as in the reference's chromosome whitelist + "" drops
    // (temp-tidy-all-api-ftp-files.R:98-104).
    "q04_filter_in_set" -> { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").isin("ECONOMY", "SMALL"))
        .filter(col("p_name").rlike("red|blue"))
        .filter(col("p_size").between(1, 40))
        .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"))
        .orderBy(col("p_partkey"))
    },

    // §2.1 #4 — distinct() (terminal step of every template join).
    "q05_distinct" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // §2.1 #5 — the hgnc_symbol_template_func() idiom: every customer
    // exactly represented, sources LEFT JOINed on. NULL-preserving.
    "q06_template_join" -> { (s, d) =>
      val template = Tables.customer(s, d).select(col("c_custkey")).distinct()
      val perCust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
        .withColumnRenamed("o_custkey", "c_custkey")
      perCust.templateJoin(template, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    },

    // §2.1 #6 — anti join (reference drops unmapped genes with
    // filter(!is.na(...)) after left joins; the complement set):
    // customers who never placed an urgent order.
    "q07_anti_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // §2.1 #6 — semi join (EXISTS): customers with ≥1 urgent order,
    // without duplicating them per order.
    "q64_semi_join" -> { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // §2.1 #17 — set operations (dplyr intersect/setdiff): brands
    // appearing among large parts vs small parts.
    "q65_set_ops" -> { (s, d) =>
      val large = Tables.part(s, d).filter(col("p_size") >= 30)
        .select(col("p_brand")).distinct()
      val small = Tables.part(s, d).filter(col("p_size") <= 5)
        .select(col("p_brand")).distinct()
      large.intersect(small).withColumn("op", lit("both"))
        .unionByName(large.except(small).withColumn("op", lit("large_only")))
        .orderBy(col("op"), col("p_brand"))
    },

    // §2.1 #9 — keep-singletons conflict dedup (IMPC viability,
    // temp-tidy-all-api-ftp-files.R:213-219): drop orders whose line
    // items carry conflicting return flags (one-to-many conflict drop).
    "q08_conflict_dedup" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_returnflag"))
        .keepSingletons(Seq("l_orderkey"), "l_returnflag")
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_returnflag")).as("returnflag"))
        .orderBy(col("l_orderkey"))
    },

    // §2.1 #9b — nullify-conflicts dedup variant
    // (temp-tidy-all-api-ftp-files.R:268-270): keys with multiple rows
    // keep exactly ONE row with NULL'd annotation columns, vs q08's
    // drop-the-key semantics.
    "q102_nullify_conflicts" -> { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"))
        .nullifyConflicts(Seq("o_custkey"), Seq("o_orderstatus", "o_orderpriority"))
        .orderBy(col("o_custkey"))
    },

    // §2.1 #8 — sorted '|'-collapse of distinct flags per key + derived
    // viability verdict (MGI lethal-term pattern, .R:250-263).
    "q09_collapse_flags" -> { (s, d) =>
      Tables.lineitem(s, d)
        .collapseDistinct(Seq("l_orderkey"), "l_returnflag", "|", "flags")
        .withColumn("status",
          when(col("flags") === "N", lit("clean")).otherwise(lit("flagged")))
        .orderBy(col("l_orderkey"))
    },

    // §2.1 #10 — ranked keep-one-per-key (gnomAD MANE-select pattern).
    "q10_rank_per_key" -> { (s, d) =>
      Tables.orders(s, d)
        .topPerKey(Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"))
    }
  )

  val oracleSql: Map[String, String] = Map(

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q03_priority_counts" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q04_filter_in_set" ->
      """SELECT p_partkey, p_name, p_type, p_size
        |FROM part
        |WHERE p_type IN ('ECONOMY','SMALL')
        |  AND regexp_matches(p_name, 'red|blue')
        |  AND p_size BETWEEN 1 AND 40
        |ORDER BY p_partkey""".stripMargin,

    "q05_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q06_template_join" ->
      """SELECT t.c_custkey, p.n_orders, p.total_spend
        |FROM (SELECT DISTINCT c_custkey FROM customer) t
        |LEFT JOIN (
        |  SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |  FROM orders GROUP BY o_custkey
        |) p USING (c_custkey)
        |ORDER BY t.c_custkey""".stripMargin,

    "q07_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q64_semi_join" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q65_set_ops" ->
      """SELECT p_brand, op FROM (
        |  SELECT p_brand, 'both' AS op FROM (
        |    SELECT DISTINCT p_brand FROM part WHERE p_size >= 30
        |    INTERSECT
        |    SELECT DISTINCT p_brand FROM part WHERE p_size <= 5)
        |  UNION ALL
        |  SELECT p_brand, 'large_only' AS op FROM (
        |    SELECT DISTINCT p_brand FROM part WHERE p_size >= 30
        |    EXCEPT
        |    SELECT DISTINCT p_brand FROM part WHERE p_size <= 5))
        |ORDER BY op, p_brand""".stripMargin,

    "q08_conflict_dedup" ->
      """SELECT l_orderkey, MIN(l_returnflag) AS returnflag
        |FROM lineitem
        |GROUP BY l_orderkey
        |HAVING COUNT(DISTINCT l_returnflag) = 1
        |ORDER BY l_orderkey""".stripMargin,

    "q102_nullify_conflicts" ->
      """WITH src AS (SELECT o_custkey, o_orderstatus, o_orderpriority FROM orders),
        |n AS (SELECT o_custkey, COUNT(*) AS n FROM src GROUP BY 1)
        |SELECT DISTINCT s.o_custkey AS o_custkey,
        |  CASE WHEN n.n > 1 THEN NULL ELSE s.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN n.n > 1 THEN NULL ELSE s.o_orderpriority END AS o_orderpriority
        |FROM src s JOIN n USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    "q09_collapse_flags" ->
      """SELECT l_orderkey,
        |  string_agg(DISTINCT l_returnflag, '|' ORDER BY l_returnflag) AS flags,
        |  CASE WHEN string_agg(DISTINCT l_returnflag, '|' ORDER BY l_returnflag) = 'N'
        |       THEN 'clean' ELSE 'flagged' END AS status
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,

    "q10_rank_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM orders
        |QUALIFY row_number() OVER (
        |  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) = 1
        |ORDER BY o_custkey""".stripMargin
  )
}
