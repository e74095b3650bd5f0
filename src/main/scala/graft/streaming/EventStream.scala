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
    // The stream source needs a declared schema — take it from the
    // batch parquet footer instead of hard-coding a flavor, then run
    // the SAME ts normalizer as the batch loader (graft.Tables), so
    // nanos-as-long / TIMESTAMP_NTZ / TIMESTAMP data all stream
    // identically. (Round-7 postmortem: a hard-coded nanos assumption
    // here put every event in Jan 1970 when the testdata went micros.)
    val batchSchema = spark.read.parquet(src.toString).schema
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(batchSchema).parquet(stage.toString))
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

  /** Memory-sink query names must be fresh per run: reusing a name
    * across runs silently reads the PREVIOUS run's table if the new
    * query fails to register rows in time under load. Monotonic
    * suffix ⇒ every run lands in its own table. */
  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private def freshName(name: String): String =
    s"${name}_r${runSeq.incrementAndGet()}"

  /** One-shot synchronous drive: Trigger.AvailableNow processes
    * everything visible at start then terminates the query itself —
    * awaitTermination() is a hard completion barrier, unlike
    * processAllAvailable() whose "available" can be a partial listing
    * under a loaded filesystem (the round-7 flakiness class). */
  private def runOnce(spark: SparkSession, streamed: DataFrame,
                      name: String, mode: String): (DataFrame, org.apache.spark.sql.streaming.StreamingQuery) = {
    val qname = freshName(name)
    val q = streamed.writeStream
      .format("memory")
      .queryName(qname)
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    (spark.table(qname), q)
  }

  /** Drive a streaming DataFrame to completion into an in-memory
    * table and return the final result. Complete mode ⇒ every window
    * is emitted regardless of watermark progress, so the result is
    * bit-equal to the batch computation over the same files.
    */
  def runToCompletion(spark: SparkSession, streamed: DataFrame,
                      name: String): DataFrame =
    runOnce(spark, streamed, name, "complete")._1

  /** Append-mode variant for stateful operators (dedup, session
    * windows) whose incremental output is row-per-first-arrival. */
  def runToCompletionAppend(spark: SparkSession, streamed: DataFrame,
                            name: String): DataFrame =
    runOnce(spark, streamed, name, "append")._1

  /** [[runToCompletionAppend]] that also returns the per-micro-batch
    * StreamingQueryProgress records, so callers can assert on
    * state-store metrics (rows held, bytes used) — the observable
    * that distinguishes a state store bounded by watermark/timeout
    * cleanup from one that grows with the stream.
    */
  def runToCompletionAppendTracked(spark: SparkSession, streamed: DataFrame,
      name: String): (DataFrame, Seq[org.apache.spark.sql.streaming.StreamingQueryProgress]) = {
    val (df, q) = runOnce(spark, streamed, name, "append")
    (df, q.recentProgress.toSeq)
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
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
