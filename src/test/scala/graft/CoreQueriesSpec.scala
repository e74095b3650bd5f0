package graft

import org.apache.spark.sql.functions._
import graft.queries.CoreQueries

class CoreQueriesSpec extends SparkSpecBase {

  test("every core query runs and returns rows at sf0.001") {
    CoreQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every core query has an oracle with matching key") {
    assert(CoreQueries.oracleSql.keySet == CoreQueries.queries.keySet)
  }

  test("q01 groups are the distinct flag/status pairs") {
    val q1 = CoreQueries.queries("q01_pricing_summary")(spark, sf)
    val q5 = CoreQueries.queries("q05_distinct")(spark, sf)
    assert(q1.count() == q5.count())
  }

  test("q06 template join preserves the full customer universe") {
    val nCust = Tables.customer(spark, sf).select("c_custkey").distinct().count()
    val q6 = CoreQueries.queries("q06_template_join")(spark, sf)
    assert(q6.count() == nCust)
    assert(q6.select("c_custkey").distinct().count() == nCust)
  }

  test("q08 keeps only orders with a single distinct returnflag") {
    val q8 = CoreQueries.queries("q08_conflict_dedup")(spark, sf)
    val conflicted = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(countDistinct("l_returnflag").as("n"))
      .filter(col("n") > 1).count()
    val total = Tables.lineitem(spark, sf).select("l_orderkey").distinct().count()
    assert(q8.count() == total - conflicted)
  }

  test("q102 nullifyConflicts keeps one NULL'd row per conflicted key") {
    import spark.implicits._
    import graft.operators.RelationalOps._
    val df = Seq(
      ("k1", "a", 1), ("k1", "b", 2),            // conflicted: 2 rows
      ("k2", "c", 3),                            // singleton: untouched
      ("k3", "d", 4), ("k3", "d", 4), ("k3", "e", 5)) // conflicted: 3 rows
      .toDF("key", "v1", "v2")
    val out = df.nullifyConflicts(Seq("key"), Seq("v1", "v2")).collect()
    assert(out.length == 3, "one row per key")
    val byKey = out.map(r => r.getString(0) -> r).toMap
    assert(byKey("k1").isNullAt(1) && byKey("k1").isNullAt(2))
    assert(byKey("k3").isNullAt(1) && byKey("k3").isNullAt(2))
    assert(byKey("k2").getString(1) == "c" && byKey("k2").getInt(2) == 3)
  }

  test("q10 returns exactly one row per customer with the max price") {
    val q10 = CoreQueries.queries("q10_rank_per_key")(spark, sf)
    val perCust = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(max("o_totalprice").as("mx"))
    val joined = q10.join(perCust, "o_custkey")
      .filter(col("o_totalprice") =!= col("mx"))
    assert(joined.count() == 0)
    assert(q10.count() == perCust.count())
  }

  test("q02 plan broadcasts the dimension tables") {
    val plan = CoreQueries.queries("q02_revenue_by_nation")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
  }

  test("q01 plan pushes the shipdate filter into the parquet scan") {
    val plan = CoreQueries.queries("q01_pricing_summary")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"no pushed filter in plan")
  }

  test("selectPositions picks and renames columns positionally") {
    import graft.operators.RelationalOps._
    val out = Tables.customer(spark, sf)
      .selectPositions(Seq(0, 4), Seq("id", "segment"))
    assert(out.columns.toSeq == Seq("id", "segment"))
    assert(out.count() == Tables.customer(spark, sf).count())
  }

  test("promoteHeader lifts the first row to column names") {
    import spark.implicits._
    import graft.operators.RelationalOps._
    val raw = Seq((1L, "gene_symbol", "score"),
      (2L, "TP53", "0.9"), (3L, "BRCA1", "0.5")).toDF("rn", "X1", "X2")
    val out = raw.promoteHeader("rn")
    assert(out.columns.toSeq == Seq("rn", "gene_symbol", "score"))
    assert(out.count() == 2)
    assert(out.filter(col("gene_symbol") === "TP53").count() == 1)
  }
}
