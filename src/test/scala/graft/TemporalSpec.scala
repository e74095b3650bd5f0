package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal
import graft.queries.TemporalQueries
import graft.streaming.EventStream

class TemporalSpec extends SparkSpecBase {

  test("every temporal query runs and returns rows at sf0.001") {
    TemporalQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }

  test("gap fill materializes the full grid; fills are zero-count and carried forward") {
    import org.apache.spark.sql.functions._
    val out = TemporalQueries.queries("q108_gap_fill")(spark, sf)
    val nTypes = Tables.events(spark, sf).select("event_type").distinct().count()
    val nHours = out.select("hour").distinct().count()
    assert(out.count() == nTypes * nHours, "grid must be complete")
    // conservation: filled zeros add nothing
    assert(out.agg(sum("n_events")).first().getLong(0) ==
      Tables.events(spark, sf).count())
    // forward fill: a zero-count hour repeats the previous observed value
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val bad = out.withColumn("prev", lag(col("sum_value_ffill"), 1).over(w))
      .filter(col("n_events") === 0 and col("prev").isNotNull and
        (col("sum_value_ffill") =!= col("prev")))
    assert(bad.count() == 0, "zero-count hours must carry the previous value")
  }

  test("streaming windowed agg equals batch windowed agg") {
    val batch = TemporalQueries.queries("q41_windowed_agg")(spark, sf).collect().toSeq
    val stream = TemporalQueries.queries("q42_stream_windowed")(spark, sf).collect().toSeq
    assert(stream == batch)
  }

  test("asof join picks the latest order at or before each event") {
    val res = TemporalQueries.queries("q43_asof_join")(spark, sf)
    // o_orderdate must never exceed event ts
    val ev = Tables.events(spark, sf).select(col("event_id"), col("ts"))
    val bad = res.join(ev, "event_id").filter(col("o_orderdate") > col("ts"))
    assert(bad.count() == 0)
    // one row per event that has any qualifying order
    assert(res.groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("sessionize: session count grows with gaps, events conserved") {
    val sess = TemporalQueries.queries("q44_sessionize")(spark, sf)
    val total = sess.agg(sum("n_events")).first().getLong(0)
    assert(total == Tables.events(spark, sf).count())
    // session ids are 1..k contiguous per user
    val maxVsCount = sess.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n"))
    assert(maxVsCount.count() == 0)
  }

  test("native session_window agrees with lag-based sessionize on counts") {
    val sw = TemporalQueries.queries("q60_session_window")(spark, sf)
    val lg = TemporalQueries.queries("q44_sessionize")(spark, sf)
    assert(sw.count() == lg.count())
    assert(sw.agg(sum("n_events")).first().getLong(0) ==
      lg.agg(sum("n_events")).first().getLong(0))
  }

  test("event dedup keeps exactly one earliest row per key") {
    val d = TemporalQueries.queries("q45_event_dedup")(spark, sf)
    val keys = Tables.events(spark, sf).select("user_id", "event_type").distinct().count()
    assert(d.count() == keys)
  }

  test("stateful streaming: dropDuplicates over the stream matches batch dedup keys") {
    val stream = EventStream.readEvents(spark, sf)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    val got = EventStream.runToCompletionAppend(spark, stream, "graft_dedup_stream")
    val exp = Tables.events(spark, sf).select("user_id", "event_type").distinct()
    assert(got.count() == exp.count())
  }

  test("ewmaAnomaly matches the hand-computed recurrence on a tiny series") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(ts0.getTime + m * 60000L)
    // flat series with one spike at the end
    val rows = Seq(
      (1L, "a", t(0), 10.0), (2L, "a", t(1), 10.0),
      (3L, "a", t(2), 10.0), (4L, "a", t(3), 100.0))
      .toDF("event_id", "event_type", "ts", "value")
    val out = graft.operators.Temporal.ewmaAnomaly(rows, "event_type",
      "ts", "event_id", "value", window = 20)
      .orderBy("event_id").collect()
    // n=1: ewma = x1 = 10; n=4 weights (1/8,1/4,1/2,1), Σ = 15/8:
    // num = 10/8 + 10/4 + 10/2 + 100 = 108.75; ewma = 108.75/1.875 = 58
    assert(math.abs(out(0).getAs[Double]("ewma") - 10.0) < 1e-9)
    assert(math.abs(out(3).getAs[Double]("ewma") - 58.0) < 1e-9)
    assert(!out(2).getAs[Boolean]("is_spike"))
    assert(out(3).getAs[Boolean]("is_spike"),
      "the 10x jump must flag against the trailing average")
  }

  test("ewmaAnomaly: flat series never flags; window bounds the frame") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = (1 to 50).map(i =>
      (i.toLong, "b", new java.sql.Timestamp(ts0.getTime + i * 1000L), 5.0))
      .toDF("event_id", "event_type", "ts", "value")
    val out = graft.operators.Temporal.ewmaAnomaly(rows, "event_type",
      "ts", "event_id", "value", window = 20).collect()
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("ewma") - 5.0) < 1e-9)
      assert(!r.getAs[Boolean]("is_spike"))
    }
  }

  test("q173: convo is (ts, id)-ordered, capped at 50 turns, singletons dropped") {
    val out = SparkEntry.queries("q173_dialog_pack")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nTurns = r.getAs[Long]("n_turns")
      assert(nTurns >= 2L, "singleton sessions must be dropped")
      val emitted = r.getAs[String]("convo").split(" ").length
      assert(emitted === math.min(nTurns, 50L).toInt,
        s"convo holds min(n_turns, 50) turns, got $emitted of $nTurns")
      // every turn renders as type:integer
      assert(r.getAs[String]("convo").split(" ")
        .forall(_.matches("[a-z_]+:-?[0-9]+")))
    }
  }
}
