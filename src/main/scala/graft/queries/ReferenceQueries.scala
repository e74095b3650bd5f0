package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.RelationalOps._

/** SURVEY.md §2.1 #11-24 + §2.2 #27 — the reference pipeline's
  * reshaping / regex / recode / bridge patterns on the driver tables.
  */
object ReferenceQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // §2.1 #11 — tidyr::separate_rows: one row per delimited token
    // (prev_symbol/alias_symbol '|'-splits, tidy-api-ftp.R:26,37).
    "q11_separate_rows" -> { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_name").as("word"))
        .separateRows("word", " ")
        .orderBy(col("p_partkey"), col("word"))
    },

    // §2.1 #12 — pivot_wider (GO BP/MF/CC ontology → columns,
    // tidy-api-ftp.R:293-295): order-status counts per customer.
    "q12_pivot_wider" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .na.fill(0, Seq("F", "O", "P"))
        .withColumnRenamed("F", "n_f")
        .withColumnRenamed("O", "n_o")
        .withColumnRenamed("P", "n_p")
        .orderBy(col("o_custkey"))
    },

    // §2.1 #13 — DepMap matrix pass (tidy-web.R:12-47): threshold the
    // gene×cell-line effect matrix, rowSums → % essential, rowMeans.
    // Here: per part, % of lineitems under a quantity threshold + mean.
    // Integer arithmetic until a single double division ⇒ deterministic.
    "q13_essentiality_matrix" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(
          count(lit(1)).as("n_lines"),
          sum(when(col("l_quantity") <= 10.0, 1L).otherwise(0L)).as("n_low"),
          round((lit(100) * sum(when(col("l_quantity") <= 10.0, 1L).otherwise(0L)))
            .cast("double") / count(lit(1)), 6).as("pct_low"),
          round(dsum(col("l_quantity")) / count(lit(1)), 6).as("mean_qty"))
        .orderBy(col("l_partkey"))
    },

    // §2.1 #16 — full_join + round (DepMap full_join, tidy-web.R:43-47):
    // per-nation customer vs supplier balance, full outer, round(3).
    "q14_full_join_round" -> { (s, d) =>
      val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
        .agg(dsum(col("c_acctbal")).as("cust_bal"))
      val p = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nationkey"))
        .agg(dsum(col("s_acctbal")).as("supp_bal"))
      c.join(p, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          round(col("cust_bal"), 3).as("cust_bal"),
          round(col("supp_bal"), 3).as("supp_bal"))
        .orderBy(col("nationkey"))
    },

    // §2.1 #14 — case_when recode (PanelApp confidence→colour,
    // tidy-api-ftp.R:486-491; lethality L1..NL→labels, :420-432).
    "q15_case_when_recode" -> { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size"),
          when(col("p_size") >= 30, lit("green"))
            .when(col("p_size") >= 15, lit("amber"))
            .when(col("p_size") >= 1, lit("red"))
            .otherwise(lit(null)).as("confidence"))
        .orderBy(col("p_partkey"))
    },

    // §2.1 #15 — NA normalization: na_if + coalesce round-trip
    // (na_if(x,""), tidy-api-ftp.R:17; replace '-'→NA, :411).
    "q16_na_normalize" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .naIf("N", Seq("l_returnflag"))
        .withColumn("returnflag_filled",
          coalesce(col("l_returnflag"), lit("none")))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // §2.1 #17 — union / bind_rows (do.call(rbind, jfiles),
    // tidy-api-ftp.R:442): one entity ledger over two tables.
    "q17_union_dedup" -> { (s, d) =>
      val c = Tables.customer(s, d)
        .select(col("c_name").as("name"), lit("customer").as("kind"))
      val p = Tables.supplier(s, d)
        .select(col("s_name").as("name"), lit("supplier").as("kind"))
      c.unionByName(p).distinct().orderBy(col("kind"), col("name"))
    },

    // §2.1 #18 — regex keyword extraction + explode (OMIM moi keywords:
    // str_extract_all + separate_rows, tidy-api-ftp.R:356-364).
    "q18_regex_extract_moi" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(array_distinct(
            regexp_extract_all(col("text"), lit("spark|data|query"), lit(0)))).as("keyword"))
        .orderBy(col("doc_id"), col("keyword"))
    },

    // §2.1 #19 — str_to_sentence (PANTHER class terms,
    // tidy-api-ftp.R:132-136) + trimws.
    "q19_sentence_case" -> { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          concat(upper(substring(col("p_type"), 1, 1)),
            lower(expr("substring(p_type, 2, length(p_type))"))).as("type_sentence"))
        .orderBy(col("p_partkey"))
    },

    // §2.1 #20 — deterministic top-k (arrange + head).
    "q20_topk_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // §2.1 #21 — scalar derivation (gene_length = end-start+1,
    // tidy-api-ftp.R:95; score/1000, :181): full charge per line item.
    "q21_derived_scalar" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice"))
            * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))
            * (lit(1).cast(DecimalType(18, 2)) + dec(col("l_tax"))))
            .cast("double").as("charge"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // §2.1 #22 — id-bridge translation chain (symbol↔ensembl↔uniprot,
    // tidy-api-ftp.R:57-66): lineitem → part + supplier attributes.
    "q22_id_bridge" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val su = Tables.supplier(s, d)
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("p_brand"), col("s_name"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // §2.1 #23 — self-join edge expansion (STRING PPI both-endpoint
    // resolution, tidy-api-ftp.R:147-162): co-nation customer pairs.
    "q23_ppi_self_join" -> { (s, d) =>
      val c1 = Tables.customer(s, d).select(
        col("c_custkey").as("k1"), col("c_nationkey").as("nationkey"))
      val c2 = Tables.customer(s, d).select(
        col("c_custkey").as("k2"), col("c_nationkey").as("nationkey"))
      val n = Tables.nation(s, d)
      c1.join(c2, "nationkey")
        .filter(col("k1") < col("k2"))
        .join(broadcast(n), col("nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("n_name"))
    },

    // §2.1 #24 — SQL front-end parity: same engine via spark.sql over
    // temp views (the reference's dplyr surface, but in SQL).
    "q24_sql_frontend" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql(
        """SELECT o_orderpriority,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
          |FROM v_lineitem JOIN v_orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    // §2.2 #27 — nested JSON → typed columns (PanelApp fromJSON →
    // key/value long table, tidy-api-ftp.R:441-484).
    "q25_json_kv_long" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy(col("event_id"))
    }
  )

  val oracleSql: Map[String, String] = Map(

    "q11_separate_rows" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
        |FROM part
        |ORDER BY p_partkey, word""".stripMargin,

    "q12_pivot_wider" ->
      """SELECT o_custkey,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q13_essentiality_matrix" ->
      """SELECT l_partkey,
        |  COUNT(*) AS n_lines,
        |  CAST(SUM(CASE WHEN l_quantity <= 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  ROUND(CAST(100 * SUM(CASE WHEN l_quantity <= 10.0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS pct_low,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS mean_qty
        |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin,

    "q14_full_join_round" ->
      """SELECT COALESCE(c.nationkey, p.nationkey) AS nationkey,
        |  ROUND(c.cust_bal, 3) AS cust_bal,
        |  ROUND(p.supp_bal, 3) AS supp_bal
        |FROM (SELECT c_nationkey AS nationkey,
        |        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS cust_bal
        |      FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nationkey,
        |        CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supp_bal
        |      FROM supplier GROUP BY s_nationkey) p
        |USING (nationkey)
        |ORDER BY nationkey""".stripMargin,

    "q15_case_when_recode" ->
      """SELECT p_partkey, p_size,
        |  CASE WHEN p_size >= 30 THEN 'green'
        |       WHEN p_size >= 15 THEN 'amber'
        |       WHEN p_size >= 1 THEN 'red'
        |       ELSE NULL END AS confidence
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q16_na_normalize" ->
      """SELECT l_orderkey, l_linenumber,
        |  NULLIF(l_returnflag, 'N') AS l_returnflag,
        |  COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS returnflag_filled
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q17_union_dedup" ->
      """SELECT DISTINCT name, kind FROM (
        |  SELECT c_name AS name, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT s_name AS name, 'supplier' AS kind FROM supplier)
        |ORDER BY kind, name""".stripMargin,

    "q18_regex_extract_moi" ->
      """SELECT doc_id,
        |  unnest(list_distinct(regexp_extract_all(text, 'spark|data|query'))) AS keyword
        |FROM documents
        |ORDER BY doc_id, keyword""".stripMargin,

    "q19_sentence_case" ->
      """SELECT p_partkey,
        |  upper(substr(p_type, 1, 1)) || lower(substr(p_type, 2)) AS type_sentence
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q20_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q21_derived_scalar" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |     * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |     * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q22_id_bridge" ->
      """SELECT l_orderkey, l_linenumber, p_brand, s_name
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q23_ppi_self_join" ->
      """SELECT n_name, COUNT(*) AS n_pairs
        |FROM customer c1
        |JOIN customer c2 ON c1.c_nationkey = c2.c_nationkey
        |               AND c1.c_custkey < c2.c_custkey
        |JOIN nation ON c1.c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q24_sql_frontend" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q25_json_kv_long" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin
  )
}
