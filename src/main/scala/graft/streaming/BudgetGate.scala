package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Selection

/** SURVEY §2.3 #37c, streaming form — token-budget ADMISSION CONTROL:
  * a corpus build that stops accepting documents the moment a global
  * token budget is filled, while data is still arriving. The batch
  * operator (q107 / `Selection.budgetSelect`) answers "which docs fit
  * the budget" over a static corpus; this gate answers it ONLINE,
  * batch order = arrival order, so ingest can be shut off the moment
  * the budget binds instead of overshooting and re-trimming a lake.
  *
  * Per micro-batch (foreachBatch, checkpointed):
  *  1. prior spend = Σ ledger rows of STRICTLY earlier batches (in
  *     stream order the only generation that can be half-committed on
  *     a replay is this batch's own, so `batch < batchId` is both
  *     crash-safe and complete);
  *  2. within the batch, `budgetSelect` runs the distributed prefix
  *     sum against the REMAINING budget (range partition + local
  *     window + broadcast offsets — never a single-task global
  *     window);
  *  3. admitted rows land in `out/batch=<id>` (overwrite = replay-
  *     idempotent), carrying `cum_global` = prior + within-batch
  *     cumulative — the global spend watermark per admitted row;
  *  4. the batch's spend is read back FROM THE COMMITTED output and
  *     appended to the ledger as `ledger/batch=<id>` (overwrite), so
  *     the ledger can never record tokens the lake doesn't hold.
  *
  * The ledger is one row per batch — driver-side reads of it are
  * batch-count-sized, not data-sized.
  */
object BudgetGate {

  /** Initialize the ledger (idempotent): a zero-spend sentinel row so
    * the first batch's read finds a valid parquet table. */
  def initLedger(spark: SparkSession, ledgerDir: String): Unit =
    spark.range(1).select(lit(0L).as("spent"))
      .write.mode("overwrite").parquet(s"$ledgerDir/batch=-1")

  /** `docs` must carry `sortCols` (a TOTAL order within a batch — the
    * admission ranking, ties broken) and integer `weightCol`. */
  def run(docs: DataFrame, ledgerDir: String, outDir: String,
          checkpointDir: String, sortCols: Seq[String], weightCol: String,
          budget: Long): Unit = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        // persist the micro-batch: budgetSelect's prefix-sum machinery
        // consumes it more than once, and an un-persisted batch
        // re-reads the SOURCE files per consumer (STRESS_r12 measured
        // up to 3x input rows per trigger before this)
        val cached = batch.persist()
        try {
          val prior = sp.read.parquet(ledgerDir)
            .filter(col("batch") < batchId)
            .agg(coalesce(sum(col("spent")), lit(0L))).first().getLong(0)
          val remaining = math.max(0L, budget - prior)
          Selection.budgetSelect(cached.toDF(), sortCols.map(col),
              col(weightCol), remaining)
            .withColumn("cum_global", col("cum_weight") + lit(prior))
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          val spent = sp.read.parquet(s"$outDir/batch=$batchId")
            .agg(coalesce(sum(col(weightCol).cast("long")), lit(0L)))
            .first().getLong(0)
          sp.range(1).select(lit(spent).as("spent"))
            .write.mode("overwrite").parquet(s"$ledgerDir/batch=$batchId")
        } finally cached.unpersist(blocking = false)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
