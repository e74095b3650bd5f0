package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Streaming PSI drift monitor — q123's population-stability index
  * applied at the stream door: every micro-batch's doc-length
  * histogram is compared against a FIXED reference distribution, and
  * the per-batch, per-bin PSI report (plus a batch-level drift flag)
  * lands in a monitor table the ops side can alert on. This is the
  * gate that notices "this ingest slice doesn't look like the corpus
  * the model was tuned on" BEFORE the slice trains anything.
  *
  * Scale shape: the reference histogram is dimension-sized (one row
  * per bin) and collected ONCE up front — the per-batch work is one
  * bounded groupBy (≤ nBins rows out of any batch size) joined to the
  * 5-row bin spine; nothing driver-side ever scales with the stream.
  * Laplace smoothing (+1 / +nBins) matches q123 exactly, so a
  * never-seen bin contributes a finite, positive term instead of a
  * division by zero. Reports are per-batch overwrite partitions
  * (`batch=<id>`) — the same exactly-once-on-replay contract as
  * DedupStream/QualityGate.
  */
object DriftMonitor {

  val NBins = 5L

  private def binCol(c: Column): Column =
    least(lit(NBins - 1), floor(c / 100).cast("long"))

  /** The 5-bin reference histogram — the only driver materialization,
    * bounded by the bin count, never by the reference size. */
  def referenceHistogram(ref: DataFrame, lenCol: String): Map[Long, Long] =
    ref.groupBy(binCol(col(lenCol)).as("bin")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  def run(docs: DataFrame, lenCol: String, refHist: Map[Long, Long],
          threshold: Double, outDir: String, checkpointDir: String): Unit = {
    require(refHist.values.sum > 0, "empty reference histogram")
    val tRef = refHist.values.sum
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val spine = (0L until NBins)
          .map(b => (b, refHist.getOrElse(b, 0L))).toDF("bin", "n_ref")
        val live = batch
          .groupBy(binCol(col(lenCol)).as("bin"))
          .agg(count(lit(1)).as("n_live"))
        val binned = spine.join(live, Seq("bin"), "left")
          .na.fill(0L, Seq("n_live"))
        val terms = binned
          .crossJoin(binned.agg(sum(col("n_live")).as("t_live")))
          .withColumn("p_ref",
            (col("n_ref") + 1.0) / (lit(tRef) + lit(NBins)))
          .withColumn("p_live",
            (col("n_live") + 1.0) / (col("t_live") + lit(NBins)))
          .withColumn("psi_term",
            (col("p_live") - col("p_ref")) * log(col("p_live") / col("p_ref")))
          .persist() // a bin-count-sized frame, read twice
        try {
          val report = terms
            .crossJoin(terms.agg(sum(col("psi_term")).as("psi_total")))
            .withColumn("batch_id", lit(batchId))
            .withColumn("drifted", col("psi_total") > threshold)
            .select("batch_id", "bin", "n_ref", "n_live", "p_ref", "p_live",
              "psi_term", "psi_total", "drifted")
          report.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        } finally terms.unpersist(blocking = false)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
