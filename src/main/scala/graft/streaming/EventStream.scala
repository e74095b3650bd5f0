package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.4 #42 — Structured Streaming over the events table.
  *
  * The file source replays the driver parquet as a stream; the same
  * windowed aggregation then runs through the incremental engine with
  * a watermark. `runToCompletion` drives it synchronously (memory
  * sink + processAllAvailable) so batch parity is testable — and the
  * driver's Verify can treat it as a query.
  */
object EventStream {

  /** events.parquet schema as the streaming source must declare it
    * (ts arrives as INT64 nanos; normalized to timestamp below). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // The file stream source wants a directory; the test layout is one
    // flat parquet per table, so expose events.parquet through a
    // symlinked staging dir (no copy, testdata untouched).
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    require(java.nio.file.Files.exists(src), s"no events table at $src")
    val stage = java.nio.file.Files.createTempDirectory("graft-stream")
    val link = stage.resolve("events.parquet")
    java.nio.file.Files.createSymbolicLink(link, src)
    // staging is per-call scratch: reclaim it on JVM exit (deleteOnExit
    // runs LIFO, so register the dir first, then the link inside it)
    stage.toFile.deleteOnExit()
    link.toFile.deleteOnExit()
    spark.readStream
      .schema(rawSchema)
      .parquet(stage.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling 1-hour windowed counts/sums per event type with a
    * 10-minute watermark — the canonical incremental aggregation. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Drive a streaming DataFrame to completion into an in-memory
    * table and return the final result. Complete mode ⇒ every window
    * is emitted regardless of watermark progress, so the result is
    * bit-equal to the batch computation over the same files.
    */
  def runToCompletion(spark: SparkSession, streamed: DataFrame,
                      name: String): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Append-mode variant for stateful operators (dedup, session
    * windows) whose incremental output is row-per-first-arrival. */
  def runToCompletionAppend(spark: SparkSession, streamed: DataFrame,
                            name: String): DataFrame = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** [[runToCompletionAppend]] that also returns the per-micro-batch
    * StreamingQueryProgress records, so callers can assert on
    * state-store metrics (rows held, bytes used) — the observable
    * that distinguishes a state store bounded by watermark/timeout
    * cleanup from one that grows with the stream.
    */
  def runToCompletionAppendTracked(spark: SparkSession, streamed: DataFrame,
      name: String): (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
    val q = streamed.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    (spark.table(name), q.recentProgress.toSeq)
  }

  /** Incremental partitioned-parquet sink via foreachBatch — the
    * streaming-ingest-to-lake shape: each micro-batch appends to a
    * partitioned parquet table; the checkpoint (batch id tracking)
    * makes the write effectively-once on restart, and repartitioning
    * on the partition columns inside the batch prevents the
    * small-files explosion (one file per partition value per batch,
    * not one per task).
    */
  def runToParquet(spark: SparkSession, streamed: DataFrame, outDir: String,
                   checkpointDir: String, partitionCols: Seq[String]): Unit = {
    val q = streamed.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch
          .repartition(partitionCols.map(batch.col): _*)
          .write.mode("append")
          .partitionBy(partitionCols: _*)
          .parquet(outDir)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }
}
