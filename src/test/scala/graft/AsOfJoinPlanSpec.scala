package graft

import org.apache.spark.sql.functions._
import graft.queries.TemporalQueries

class AsOfJoinPlanSpec extends SparkSpecBase {

  test("native as-of join plans AsOfJoinExec (not a window)") {
    val df = TemporalQueries.queries("q43b_asof_native")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), "fell back to the window formulation")
  }

  test("native as-of join equals the compositional as-of join") {
    val native = TemporalQueries.queries("q43b_asof_native")(spark, sf)
      .collect().toSeq
    val windowed = TemporalQueries.queries("q43_asof_join")(spark, sf)
      .collect().toSeq
    assert(native.size == windowed.size)
    assert(native.toSet == windowed.toSet)
  }

  test("left rows with no qualifying right row null-extend (pre-filter)") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    // restrict orders to users < 5: most events have no match
    val ord = Tables.orders(spark, sf)
      .filter(col("o_custkey") < 5)
      .select(col("o_custkey").as("r_user_id"), col("o_orderkey"),
        col("o_orderdate"))
    val joined = graft.plans.AsOfJoinPlan.asofJoin(ev, ord,
      "user_id", "r_user_id", "ts", "o_orderdate", "o_orderkey")
    assert(joined.count() == ev.count()) // left-outer semantics
    assert(joined.filter(col("o_orderkey").isNull).count() > 0)
    assert(joined.filter(col("o_orderkey").isNotNull)
      .filter(col("user_id") >= 5).count() == 0)
  }
}
