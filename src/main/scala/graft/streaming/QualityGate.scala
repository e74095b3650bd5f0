package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Streaming ingest validation gate — Quality.expectations applied at
  * the door: each micro-batch's rows are checked against the declared
  * constraints; clean rows land in the lake, violating rows are
  * QUARANTINED together with the names of the constraints they broke.
  * The stream never stalls on bad data and nothing is silently
  * dropped — the quarantine is replayable input for a repair pass.
  *
  * Row routing is one narrow projection (each check contributes a
  * `when(violation, name)` element to an array column); the batch is
  * persisted once so the two routed writes share the scan. Writes are
  * per-batch overwrite partitions (`batch=<id>`), the same
  * exactly-once-on-replay contract as DedupStream.
  */
object QualityGate {

  def run(docs: DataFrame, checks: Seq[(String, Column)],
          outDir: String, quarantineDir: String,
          checkpointDir: String): Unit = {
    require(checks.nonEmpty, "at least one check")
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val flagged = batch.withColumn("__viol",
          array_compact(array(checks.map { case (n, viol) =>
            when(viol, lit(n)).otherwise(lit(null).cast("string"))
          }: _*))).persist()
        try {
          flagged.filter(size(col("__viol")) === 0).drop("__viol")
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          flagged.filter(size(col("__viol")) > 0)
            .withColumn("violations", array_join(col("__viol"), ","))
            .drop("__viol")
            .write.mode("overwrite").parquet(s"$quarantineDir/batch=$batchId")
        } finally flagged.unpersist(blocking = false)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
