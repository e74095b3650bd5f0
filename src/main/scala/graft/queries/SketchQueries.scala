package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.3 addendum — sketch aggregates. At 100 TB, exact
  * count-distinct/percentile over high-cardinality keys is a full
  * shuffle of the key space; HLL++ / GK sketches are mergeable
  * map-side state of bounded size. Rows-only (DuckDB's approx
  * algorithms differ); QualitySpec bounds the relative error vs exact.
  */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q46_sketch_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }
  )

  val oracleSql: Map[String, String] = Map.empty
}
