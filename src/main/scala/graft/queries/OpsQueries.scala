package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2 addendum — pipeline-operations breadth: range joins,
  * deterministic holdout splits, exact quantiles, data profiling.
  */
object OpsQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // range self-join: same-user event pairs within 60 s — equi key
    // bounds the pair space, the band predicate is evaluated inside
    // the per-key group (the scalable shape for temporal joins).
    "q51_range_join" -> { (s, d) =>
      val e = Tables.events(s, d)
      val a = e.select(col("user_id"), col("event_id").as("id_a"),
        col("ts").as("ts_a"))
      val b = e.select(col("user_id"), col("event_id").as("id_b"),
        col("ts").as("ts_b"))
      a.join(b, Seq("user_id"))
        .filter(col("id_a") < col("id_b") &&
          abs(unix_micros(col("ts_b")) - unix_micros(col("ts_a"))) <= 60000000L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_close_pairs"))
        .orderBy(col("user_id"))
    },

    // deterministic train/holdout split via content hash — the
    // reproducible sampling a training pipeline needs (no rand()).
    "q52_train_split" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(substring(md5(col("doc_id").cast("string")), 1, 1)
            .isin("0", "1", "2"), lit("holdout"))
            .otherwise(lit("train")).as("split"))
        .orderBy(col("doc_id"))
    },

    // exact interpolated median per group (sort-based quantile).
    "q53_median" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("median_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // data profiling: per-column null counts / distinct counts /
    // ranges — the audit pass an ingest pipeline runs on every load.
    "q54_profile" -> { (s, d) =>
      Tables.customer(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("c_name").isNull.cast("long")).as("null_name"),
          countDistinct(col("c_mktsegment")).as("distinct_segments"),
          countDistinct(col("c_nationkey")).as("distinct_nations"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"))
    }
  )

  val oracleSql: Map[String, String] = Map(

    "q51_range_join" ->
      """SELECT a.user_id AS user_id, COUNT(*) AS n_close_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
        |GROUP BY a.user_id
        |ORDER BY user_id""".stripMargin,

    "q52_train_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2')
        |       THEN 'holdout' ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q53_median" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS median_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q54_profile" ->
      """SELECT COUNT(*) AS n_rows,
        |  SUM(CAST(c_name IS NULL AS BIGINT)) AS null_name,
        |  COUNT(DISTINCT c_mktsegment) AS distinct_segments,
        |  COUNT(DISTINCT c_nationkey) AS distinct_nations,
        |  MIN(c_acctbal) AS min_bal,
        |  MAX(c_acctbal) AS max_bal
        |FROM customer""".stripMargin
  )
}
