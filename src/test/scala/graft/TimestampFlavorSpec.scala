package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Temporal
import graft.streaming.EventStream

/** Round-8 regression spec for the breakage class that cost round 7
  * nine queries: the driver's events.parquet has shipped (at least)
  * two different parquet timestamp flavors across rounds, and the
  * engine must produce IDENTICAL results on all of them.
  *
  * Three fixtures, one per flavor the wild produces:
  *   - nanos-as-long  — TIMESTAMP(NANOS) parquet arrives in Spark as a
  *     raw INT64 under spark.sql.legacy.parquet.nanosAsLong=true; the
  *     fixture writes the LongType column Spark would see;
  *   - TIMESTAMP_NTZ  — TIMESTAMP(MICROS, isAdjustedToUTC=false);
  *   - TIMESTAMP (ltz)— TIMESTAMP(MICROS, isAdjustedToUTC=true).
  *
  * Every fixture must flow through Tables.events, EventStream
  * .readEvents, sessionize and windowedAgg with bit-identical output.
  */
class TimestampFlavorSpec extends SparkSpecBase {
  import spark.implicits._

  // 40 events, 4 users, spanning several hours with >30-min gaps so
  // sessionization produces multiple sessions per user.
  private val baseMicros = 1704100000000000L // 2024-01-01T08:26:40Z
  private lazy val canonical: DataFrame = {
    val rows = (0 until 40).map { i =>
      val us = baseMicros + (i / 4) * 1300L * 1000000L + (i % 4) * 17L * 1000000L
      (i.toLong, us, (i % 4).toLong,
        if (i % 3 == 0) "click" else "purchase", i * 1.25, s"""{"k":${i % 5}}""")
    }
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
  }

  /** Write the canonical events as dir/events.parquet in one flavor. */
  private def writeFlavor(flavor: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-tsflavor-$flavor").toString
    val df = flavor match {
      case "nanos_long" =>
        canonical.withColumn("ts", col("ts_us") * 1000L)
      case "ntz_micros" =>
        canonical.withColumn("ts",
          timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      case "ltz_micros" =>
        canonical.withColumn("ts", timestamp_micros(col("ts_us")))
    }
    // the driver layout is one FLAT file per table (and readEvents
    // symlinks that file), so lift the single part file out of the
    // directory Spark writes
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  private lazy val dirs: Map[String, String] =
    Seq("nanos_long", "ntz_micros", "ltz_micros")
      .map(f => f -> writeFlavor(f)).toMap

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("fixtures actually carry three distinct Spark-visible ts types") {
    val types = dirs.map { case (f, d) =>
      f -> spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    }
    assert(types("nanos_long") == LongType)
    assert(types("ntz_micros") == TimestampNTZType)
    assert(types("ltz_micros") == TimestampType)
  }

  test("Tables.events normalizes every flavor to TimestampType, same values") {
    val loaded = dirs.map { case (f, d) => f -> Tables.events(spark, d) }
    loaded.values.foreach(df => assert(df.schema("ts").dataType == TimestampType))
    val rendered = loaded.map { case (f, df) =>
      f -> rowsOf(df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id"))
    }
    assert(rendered("nanos_long") == rendered("ltz_micros"))
    assert(rendered("ntz_micros") == rendered("ltz_micros"))
    // and the values are the canonical micros, not an epoch-shifted copy
    val first = Tables.events(spark, dirs("ntz_micros"))
      .orderBy("event_id").select(unix_micros(col("ts"))).as[Long].head()
    assert(first == baseMicros)
  }

  test("sessionize is flavor-invariant") {
    val out = dirs.map { case (f, d) =>
      f -> rowsOf(
        Temporal.sessionize(Tables.events(spark, d), key = "user_id",
          timeCol = "ts", idCol = "event_id", gapSeconds = 1800L)
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n"),
            unix_micros(min(col("ts"))).as("s0"),
            unix_micros(max(col("ts"))).as("s1"))
          .orderBy("user_id", "session_id"))
    }
    assert(out("nanos_long") == out("ltz_micros"))
    assert(out("ntz_micros") == out("ltz_micros"))
    assert(out("ltz_micros").nonEmpty)
  }

  test("streaming readEvents + windowedAgg is flavor-invariant and batch-equal") {
    val batch = rowsOf(
      Tables.events(spark, dirs("ltz_micros"))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_micros(col("window.start")).as("w0"), col("event_type"),
          col("n_events"))
        .orderBy("w0", "event_type"))
    dirs.foreach { case (f, d) =>
      val streamed = EventStream.runToCompletion(spark,
        EventStream.windowedAgg(EventStream.readEvents(spark, d)), s"tsflavor_$f")
        .select(unix_micros(col("window_start")).as("w0"), col("event_type"),
          col("n_events"))
        .orderBy("w0", "event_type")
      assert(rowsOf(streamed) == batch, s"flavor $f diverged from batch")
    }
    // the windows land in 2024 (the r7 bug put them in Jan 1970)
    assert(batch.nonEmpty && batch.head.contains(baseMicros./(3600000000L).*(3600000000L).toString))
  }
}
