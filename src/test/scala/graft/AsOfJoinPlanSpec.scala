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

  test("null keys and null times follow SQL join semantics") {
    import spark.implicits._
    // left: user 1 at t=10/t=null, user null at t=10
    val left = Seq(
      (1L, Option(1L), Option(10L)),
      (2L, Option(1L), Option.empty[Long]),
      (3L, Option.empty[Long], Option(10L)))
      .toDF("event_id", "user_id", "ts")
    // right: a valid match for user 1, plus poison rows — null key and
    // null time — that must never match anything
    val right = Seq(
      (Option(1L), Option(5L), 100L),
      (Option.empty[Long], Option(1L), 200L),
      (Option(1L), Option.empty[Long], 300L))
      .toDF("r_user_id", "r_ts", "o_id")
    val joined = graft.plans.AsOfJoinPlan.asofJoin(left, right,
      "user_id", "r_user_id", "ts", "r_ts", "o_id")
      .select("event_id", "o_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(joined(1L).contains(100L)) // the one legitimate match
    assert(joined(2L).isEmpty, "null left time must not match")
    assert(joined(3L).isEmpty, "null left key must not match a null right key")
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
