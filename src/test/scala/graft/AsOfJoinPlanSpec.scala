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

  // direction + tolerance (the merge_asof surface): left at t=100
  // against right rows at t = 40, 90, 103, 110 (same key).
  private def dirFixture = {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, 40L, 10L), (1L, 90L, 11L), (1L, 103L, 12L), (1L, 110L, 13L))
      .toDF("r_user_id", "r_ts", "o_id")
    (left, right)
  }

  test("direction and tolerance follow the merge_asof contract") {
    val (left, right) = dirFixture
    def run(dir: String, tol: Long): Option[Long] =
      graft.plans.AsOfJoinPlan.asofJoin(left, right,
          "user_id", "r_user_id", "ts", "r_ts", "o_id",
          direction = dir, toleranceMicros = tol)
        .collect().head match {
          case r if r.isNullAt(r.fieldIndex("o_id")) => None
          case r => Some(r.getLong(r.fieldIndex("o_id")))
        }
    assert(run("backward", -1L).contains(11L)) // latest <= 100
    assert(run("backward", 5L).isEmpty)        // 100-90 > 5
    assert(run("backward", 10L).contains(11L)) // inclusive bound
    assert(run("forward", -1L).contains(12L))  // first strictly after
    assert(run("forward", 2L).isEmpty)         // 103-100 > 2
    assert(run("forward", 3L).contains(12L))
    assert(run("nearest", -1L).contains(12L))  // 3 forward < 10 backward
    assert(run("nearest", 2L).isEmpty)         // both out of tolerance
  }

  test("nearest breaks distance ties backward") {
    import spark.implicits._
    val left = Seq((1L, 1L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, 95L, 20L), (1L, 105L, 21L)).toDF("r_user_id", "r_ts", "o_id")
    val got = graft.plans.AsOfJoinPlan.asofJoin(left, right,
        "user_id", "r_user_id", "ts", "r_ts", "o_id", direction = "nearest")
      .collect().head
    assert(got.getLong(got.fieldIndex("o_id")) == 20L)
  }

  test("forward as-of (q120) equals the compositional window formulation") {
    val native = TemporalQueries.queries("q120_asof_forward")(spark, sf).collect().toSet
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"), col("ts"))
    val nxt = Tables.events(spark, sf)
      .select(col("event_id").as("next_event_id"),
        col("user_id").as("r_user_id"), col("ts").as("next_ts"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_id"))
      .orderBy(col("next_ts").asc, col("next_event_id").asc)
    val composed = ev.join(nxt, col("user_id") === col("r_user_id") &&
        col("next_ts") > col("ts") &&
        unix_micros(col("next_ts")) - unix_micros(col("ts")) <= 3L * 86400 * 1000000)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("next_event_id"),
        (unix_micros(col("next_ts")) - unix_micros(col("ts"))).as("gap_us"))
      .collect().toSet
    assert(native.nonEmpty, "q120 found no attributions — fixture degenerate")
    assert(native == composed)
  }
}
