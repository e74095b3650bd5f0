package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.RelationalOps._

/** The reference pipeline's end-to-end composition, re-expressed
  * Spark-first: a key universe (the reference: HGNC protein-coding
  * symbols; here: the customer table) is annotated by N independently
  * tidied sources, each LEFT JOINed onto the broadcast template and
  * finally assembled into one wide entity-level table — the end shape
  * of reference/scripts/tidy (all three tidy scripts), keyed by
  * utils/hgnc_symbol_template_func.R.
  *
  * Plan shape at 100 TB: every source aggregates DOWN to one-row-per-
  * key (or few-rows-per-key) BEFORE the template join, so the final
  * assembly is a sequence of broadcast-or-colocated joins on the same
  * key — no fact-sized shuffle ever crosses the assembly.
  */
object AnnotationPipeline {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** One row per customer: the full annotation table. */
  def buildAnnotations(s: SparkSession, d: String): DataFrame = {
    val template = Tables.customer(s, d)
      .select(col("c_custkey")).distinct()

    // source 1: identity/dimension attributes (gene_ids pattern)
    val identity = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name").as("nation"))

    // source 2: order stats (viability/constraint-score pattern)
    val orderStats = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total_spend"),
        max(col("o_orderdate")).as("last_order"))

    // source 3: conflict-deduped dominant priority (IMPC pattern)
    val priority = Tables.orders(s, d)
      .select(col("o_custkey").as("c_custkey"), col("o_orderpriority"))
      .keepSingletons(Seq("c_custkey"), "o_orderpriority")
      .groupBy(col("c_custkey"))
      .agg(min(col("o_orderpriority")).as("sole_priority"))

    // source 4: collapsed flag annotation (GO/MGI collapse pattern)
    val flags = Tables.orders(s, d).join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c_custkey"), col("l_returnflag"))
      .collapseDistinct(Seq("c_custkey"), "l_returnflag", "|", "return_flags")

    // assembly: template LEFT JOIN each tidied source, then distinct
    Seq(identity, orderStats, priority, flags)
      .foldLeft(template)((acc, src) => acc.join(src, Seq("c_custkey"), "left"))
      .distinct()
  }
}
