package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.IntervalJoinPlan.intervalJoin
import graft.queries.TemporalQueries

class IntervalJoinPlanSpec extends SparkSpecBase {

  test("native interval join plans IntervalJoinExec with no SQL join below") {
    val df = TemporalQueries.queries("q129_interval_native")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"fell back to a SQL join:\n$plan")
  }

  test("native interval join equals the composed banded range join") {
    val native = TemporalQueries.queries("q129_interval_native")(spark, sf)
      .collect().toSeq
    val composed = graft.operators.Temporal.bandedRangePairs(
      Tables.events(spark, sf),
      key = "user_id", timeCol = "ts", idCol = "event_id",
      bandMicros = 60000000L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_close_pairs"))
      .orderBy(col("user_id"))
      .collect().toSeq
    assert(native.nonEmpty && native.toSet == composed.toSet)
  }

  private def synth(rows: Seq[(Long, Long, Long)], kc: String, tc: String,
                    ic: String): DataFrame = {
    import spark.implicits._
    rows.toDF(kc, tc, ic)
  }

  private def brute(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
                    lo: Long, hi: Long): Set[(Long, Long)] =
    (for {
      (lk, lt, li) <- left
      (rk, rt, ri) <- right
      if lk == rk && (lt - rt) >= lo && (lt - rt) <= hi
    } yield (li, ri)).toSet

  test("band semantics are inclusive and asymmetric bands work (vs brute force)") {
    val left = for (k <- 0L to 3L; t <- 0L to 40L by 7) yield (k, t, k * 1000 + t)
    val right = for (k <- 0L to 3L; t <- 0L to 40L by 5) yield (k, t, k * 1000 + t)
    for ((lo, hi) <- Seq((-10L, 10L), (0L, 7L), (-7L, 0L), (3L, 3L), (-40L, 40L))) {
      val got = intervalJoin(
        synth(left, "k", "t", "i"), synth(right, "rk", "rt", "ri"),
        "k", "rk", "t", "rt", lo, hi)
        .select(col("i"), col("ri"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute(left, right, lo, hi), s"band [$lo,$hi] mismatch")
    }
  }

  test("hot key exercises window ingest/evict exactly (vs brute force)") {
    // one key, dense timeline: the deque must ingest and evict
    // hundreds of times and still emit each qualifying pair once
    val rows = (0L until 500L).map(t => (7L, t * 3, t))
    val got = intervalJoin(
      synth(rows, "k", "t", "i").repartition(8),
      synth(rows, "rk", "rt", "ri").repartition(5),
      "k", "rk", "t", "rt", -10L, 10L)
      .select(col("i"), col("ri"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "a pair was emitted twice")
    assert(got.toSet == brute(rows, rows, -10L, 10L))
  }

  test("null keys and null times never join (inner semantics)") {
    import spark.implicits._
    val left = Seq(
      (Option(1L), Option(10L), 1L),
      (Option(1L), Option.empty[Long], 2L),
      (Option.empty[Long], Option(10L), 3L))
      .toDF("k", "t", "i")
    val right = Seq(
      (Option(1L), Option(10L), 10L),
      (Option.empty[Long], Option(10L), 20L),
      (Option(1L), Option.empty[Long], 30L))
      .toDF("rk", "rt", "ri")
    val got = intervalJoin(left, right, "k", "rk", "t", "rt", -5L, 5L)
      .select(col("i"), col("ri"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)), s"only the non-null pair may join, got $got")
  }

  test("an empty band and a non-time column are rejected") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L)).toDF("k", "t", "i")
    intercept[IllegalArgumentException] {
      intervalJoin(df, df.toDF("rk", "rt", "ri"), "k", "rk", "t", "rt", 5L, -5L)
    }
    val strT = Seq((1L, "x", 1L)).toDF("k", "t", "i")
    intercept[IllegalArgumentException] {
      intervalJoin(strT, strT.toDF("rk", "rt", "ri"), "k", "rk", "t", "rt", 0L, 5L)
    }
  }
}
