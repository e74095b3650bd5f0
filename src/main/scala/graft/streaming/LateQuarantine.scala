package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.4 #45x — LATE-DATA QUARANTINE (dead-letter routing):
  * Spark's own watermark DROPS late rows silently, which is the wrong
  * contract for a training-data collector — an event that misses its
  * window is still data; what changed is only where it may be written.
  * This gate routes every arriving row to exactly one of two sinks:
  *
  *   on-time (ts ≥ watermark − tolerance) → `out/batch=<id>`
  *   late     (ts < watermark − tolerance) → `quarantine/batch=<id>`,
  *            stamped with `lateness_sec` and the watermark it missed
  *
  * so `out ⊎ quarantine ≡ input` ALWAYS — nothing is ever lost, and
  * the quarantine table is itself queryable (lateness distributions
  * feed the tolerance choice).
  *
  * The watermark is the max event time of STRICTLY EARLIER batches,
  * kept in a one-row-per-batch parquet ledger (`wm/batch=<id>`,
  * monotone by construction). The `batch < batchId` read plus
  * per-batch `overwrite` writes make a crash replay idempotent: a
  * half-committed generation is simply rewritten with identical
  * content (the BudgetGate/RollupStream exactly-once discipline).
  * Within a batch the verdict is one broadcast-scalar filter — no
  * shuffle, no state store; at 100 TB the ledger stays
  * batch-count-sized while the data path is a narrow map.
  */
object LateQuarantine {

  /** Sentinel for "no watermark yet" — kept NULL in the ledger so no
    * arithmetic can underflow on it. */
  def initLedger(spark: SparkSession, wmDir: String): Unit =
    spark.range(1).select(lit(null).cast("long").as("wm"))
      .write.mode("overwrite").parquet(s"$wmDir/batch=-1")

  /** `events` must carry a timestamp column `tsCol`. Rows with a NULL
    * timestamp are quarantined (lateness NULL): an unparseable event
    * time is un-windowable by definition. */
  def run(events: DataFrame, wmDir: String, outDir: String,
          quarantineDir: String, checkpointDir: String,
          tsCol: String, toleranceSec: Long): Unit = {
    val q = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        val cached = batch.persist() // consumers: verdict split ×2 + new wm
        try {
          val prior = sp.read.parquet(wmDir)
            .filter(col("batch") < batchId)
            .agg(max(col("wm"))).first() match {
              case r if r.isNullAt(0) => None
              case r => Some(r.getLong(0))
            }
          val tsSec = col(tsCol).cast("long")
          val lateCond = prior match {
            case Some(wm) => tsSec.isNull || tsSec < lit(wm - toleranceSec)
            case None     => tsSec.isNull // first batch: nothing can be late
          }
          cached.filter(!lateCond)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          val lateBase = cached.filter(lateCond)
          val late = prior match {
            case Some(wm) => lateBase
              .withColumn("watermark_sec", lit(wm))
              .withColumn("lateness_sec", lit(wm - toleranceSec) - tsSec)
            case None => lateBase
              .withColumn("watermark_sec", lit(null).cast("long"))
              .withColumn("lateness_sec", lit(null).cast("long"))
          }
          late.write.mode("overwrite").parquet(s"$quarantineDir/batch=$batchId")
          // advance the watermark from the COMMITTED batch content
          val batchMax = cached.agg(max(tsSec)).first() match {
            case r if r.isNullAt(0) => None
            case r => Some(r.getLong(0))
          }
          val newWm: Option[Long] = (prior, batchMax) match {
            case (Some(a), Some(b)) => Some(math.max(a, b))
            case (a, b)             => a.orElse(b)
          }
          sp.range(1)
            .select(newWm.map(lit(_)).getOrElse(lit(null)).cast("long").as("wm"))
            .write.mode("overwrite").parquet(s"$wmDir/batch=$batchId")
        } finally cached.unpersist(blocking = false)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
