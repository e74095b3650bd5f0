package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Pq

/** Streaming ANN serving — the retrieval-service loop over a
  * persisted [[graft.operators.Pq.writeIndex]] layout: query vectors
  * arrive as a parquet stream; each micro-batch probes the index
  * (IVF cell pruning via the broadcast probe set, ADC scoring off
  * the broadcast per-query LUTs, top-k on TopKPerKeyExec) and the
  * results land as per-batch overwrite partitions — the same
  * exactly-once-on-replay contract as DedupStream/QualityGate: a
  * replayed batch id overwrites its own directory, never duplicates.
  *
  * Scale shape: the index side is read fresh per batch (cheap — the
  * codes scan is cell-pruned BEFORE any shuffle; see
  * [[Pq.probeIndex]]'s one-exchange plan pinned in PqSpec) and the
  * per-batch query side is request-bounded, so a 1000-executor
  * cluster serves arbitrarily large query logs at a per-batch cost of
  * |probed cells| + |batch|·k. A long-lived service would cache the
  * books/cents tables; the per-batch re-read keeps crash recovery
  * trivial (no session state beyond the checkpoint).
  */
object AnnServeStream {

  val querySchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  def run(spark: SparkSession, indexDir: String, queryStreamDir: String,
          outDir: String, checkpointDir: String,
          k: Int = 10, nProbe: Int = 6, m: Int = 16): Unit = {
    val stream = spark.readStream.schema(querySchema).parquet(queryStreamDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty) {
          Pq.probeIndex(spark, indexDir, batch.toDF(), k, nProbe, m)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
