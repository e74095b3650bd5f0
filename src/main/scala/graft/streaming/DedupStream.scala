package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** SURVEY.md §2.3 #31d, streaming form — online incremental dedup:
  * the admission-control shape of a 100 TB ingest pipeline, where new
  * documents arrive continuously and known duplicates must be flagged
  * BEFORE they land in the lake, without ever recomputing corpus
  * signatures.
  *
  * Per micro-batch (foreachBatch, checkpointed):
  *  1. read the band index — all generations ever appended, merged to
  *     one min-id row per (band, band_sig) at read time (min of mins
  *     is associative, which is what makes the index append-only);
  *  2. probe the batch docs against it. The batch side's signature
  *     front is the fully-narrow codegen'd MinHashBandSig pass, so
  *     the stream adds zero shuffles of its own — the only exchange
  *     is the bounded probe join against the (small, aggregated)
  *     index;
  *  3. append the verdicts to the output lake;
  *  4. append the batch's OWN band mins to the index — so batch N+1
  *     flags duplicates of batch N, not just of the original corpus.
  *
  * Restart semantics are EXACTLY-once: both writes land in a
  * per-batch partition directory (`batch=<id>` / `gen=<id>`) with
  * overwrite mode, so a batch replayed after a crash rewrites its own
  * partition instead of double-appending — the checkpointed source
  * offsets plus idempotent per-batch writes compose to exactly-once.
  */
object DedupStream {

  /** Seed indexDir from an existing corpus (production path: the
    * narrow codegen'd front). Call once before [[run]]. */
  def seedIndex(corpus: DataFrame, indexDir: String,
                idCol: String, textCol: String,
                shingleWidth: Int = 3, nSeeds: Int = 8,
                rowsPerBand: Int = 4): Unit =
    Dedup.bandIndex(corpus, idCol, textCol, shingleWidth, nSeeds, rowsPerBand,
        Dedup.lshBandsNarrow)
      .write.mode("overwrite").parquet(s"$indexDir/gen=seed")

  /** The warehouse-shape index: a catalog table BUCKETED on
    * (band, band_sig). At 100 TB the index dwarfs the daily batch, so
    * the probe join must not shuffle it — with the bucketed layout the
    * index side reads co-located and only the (small) batch side
    * exchanges; ScaleSpec asserts exactly one Exchange in the probe
    * plan. [[seedIndex]]'s per-generation directory layout is the
    * streaming/replay shape; this is the periodic-compaction target.
    */
  def seedIndexBucketed(corpus: DataFrame, table: String,
                        idCol: String, textCol: String,
                        shingleWidth: Int = 3, nSeeds: Int = 8,
                        rowsPerBand: Int = 4, nBuckets: Int = 64): Unit =
    Dedup.bandIndex(corpus, idCol, textCol, shingleWidth, nSeeds, rowsPerBand,
        Dedup.lshBandsNarrow)
      .write.mode("overwrite")
      .bucketBy(nBuckets, "band", "band_sig")
      .sortBy("band", "band_sig")
      .saveAsTable(table)

  /** Compact the index's appended generations back to one row per
    * (band, band_sig). Probing stays correct without it (reads
    * min-merge across generations); compaction bounds the per-batch
    * read cost once many ingests have appended.
    *
    * Crash-safe at every step, with no directory swap: the compacted
    * rows are written INTO the index as a fresh `gen=c<k>` partition,
    * and only then are the superseded generations deleted. Min-merge
    * makes every intermediate state correct — a reader between the
    * write and the deletes sees each bucket's min twice and merges it;
    * a crash mid-delete leaves a still-correct (merely uncompacted)
    * index; a crash mid-write leaves only an ignored `_temporary`
    * dir, and the retry picks a new generation number. All moves go
    * through the Hadoop FileSystem API, so the same code runs against
    * HDFS/S3 lakes, not just local disk.
    */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val oldGens = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
    val nextC = oldGens.map(_.getPath.getName.stripPrefix("gen="))
      .filter(_.matches("c\\d+")).map(_.drop(1).toLong)
      .foldLeft(0L)(math.max) + 1
    spark.read.parquet(indexDir)
      .groupBy(col("band"), col("band_sig"))
      .agg(min(col("idx_min")).as("idx_min"))
      .write.mode("overwrite").parquet(s"$indexDir/gen=c$nextC")
    oldGens.foreach(s => fs.delete(s.getPath, true))
  }

  /** Drive the streaming dedup to completion over the files currently
    * in the source (processAllAvailable — the replay/test harness
    * shape; a production deployment would leave the query running).
    */
  def run(docs: DataFrame, indexDir: String, outDir: String,
          checkpointDir: String, idCol: String, textCol: String,
          shingleWidth: Int = 3, nSeeds: Int = 8, rowsPerBand: Int = 4): Unit = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        // persist the micro-batch: the probe and the index append both
        // consume it, and an un-persisted batch re-reads the SOURCE
        // files once per consumer — STRESS_r12's streaming harness
        // caught this as 2x input rows per trigger (2x ingest IO at
        // 100 TB)
        val cached = batch.persist()
        try {
          // `gen` is the partition-discovery column the per-generation
          // subdirs produce. Exclude THIS batch's generation: after a
          // crash strictly between the two writes, the replayed batch
          // would otherwise probe the half-committed index of its own
          // failed attempt and flag every doc as a duplicate of itself.
          val idxMin = sp.read.parquet(indexDir)
            .filter(col("gen").cast("string") =!= lit(batchId.toString))
            .groupBy(col("band"), col("band_sig"))
            .agg(min(col("idx_min")).as("idx_min"))
          Dedup.probeBatch(idxMin, cached.toDF(), idCol, textCol,
              shingleWidth, nSeeds, rowsPerBand, Dedup.lshBandsNarrow)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          Dedup.bandIndex(cached.toDF(), idCol, textCol,
              shingleWidth, nSeeds, rowsPerBand, Dedup.lshBandsNarrow)
            .write.mode("overwrite").parquet(s"$indexDir/gen=$batchId")
        } finally cached.unpersist(blocking = false)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
