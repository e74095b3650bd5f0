package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** SURVEY.md §2.3 (round 8), streaming form — online SPAN-level
  * duplicate detection: [[graft.operators.Dedup.winnowedFingerprints]]
  * turned into the same admission-control shape as [[DedupStream]].
  * Doc-level streaming dedup admits a "new" document that is 90%
  * copied paragraphs; the span index catches exactly that — each
  * arriving doc is probed for WINNOWING fingerprints already seen
  * anywhere in the corpus, and its own fingerprints then extend the
  * index so batch N+1 catches spans introduced in batch N.
  *
  * Per micro-batch (foreachBatch, checkpointed):
  *  1. read the fingerprint index (all generations, min-merged — the
  *     same associative append-only discipline as DedupStream's band
  *     index);
  *  2. winnow the batch (narrow codegen'd kernel) and probe: per doc,
  *     how many of its fingerprints are already held, and by whom
  *     (earliest holder);
  *  3. write per-doc verdicts (`clean` / `dup_spans`) with the shared
  *     span count and total fingerprint count;
  *  4. append the batch's own (fp, doc_min) rows as `gen=<batchId>`.
  *
  * Exactly-once on replay: both writes are per-batch overwrite
  * partitions, and the probe EXCLUDES the batch's own generation so a
  * crash strictly between the two writes cannot make the replay flag
  * every doc as duplicating itself.
  */
object SpanStream {

  private def spanIndex(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, w: Int): DataFrame =
    Dedup.winnowDocFingerprints(docs, idCol, textCol, k, w)
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_min"))

  /** Seed indexDir from an existing corpus. Call once before [[run]]. */
  def seedIndex(corpus: DataFrame, indexDir: String,
                idCol: String, textCol: String,
                k: Int = 8, w: Int = 13): Unit =
    spanIndex(corpus, idCol, textCol, k, w)
      .write.mode("overwrite").parquet(s"$indexDir/gen=seed")

  /** Probe a (static) batch against a min-merged index frame —
    * exposed for re-verification after compaction and for the batch
    * path. Emits one row per input doc. */
  def probeBatch(idxMin: DataFrame, batch: DataFrame,
                 idCol: String, textCol: String,
                 k: Int = 8, w: Int = 13): DataFrame = {
    val fps = Dedup.winnowDocFingerprints(batch, idCol, textCol, k, w)
    val hits = fps.join(idxMin, Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fps"),
        sum(col("doc_min").isNotNull.cast("long")).as("n_shared"),
        min(col("doc_min")).as("earliest_holder"))
    batch.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_fps"), lit(0L)).as("n_fps"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        col("earliest_holder"),
        when(coalesce(col("n_shared"), lit(0L)) > 0, "dup_spans")
          .otherwise("clean").as("status"))
  }

  /** Drive the streaming span dedup over the files currently in the
    * source (AvailableNow — the replay/test harness shape). */
  def run(docs: DataFrame, indexDir: String, outDir: String,
          checkpointDir: String, idCol: String, textCol: String,
          k: Int = 8, w: Int = 13): Unit = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        // persist the micro-batch: probe (which scans it twice — fps +
        // verdict join) and index append each re-read the SOURCE files
        // when un-persisted; STRESS_r12's harness measured 3x input
        // rows per trigger before this (3x ingest IO at 100 TB)
        val cached = batch.persist()
        try {
          // An unseeded index dir (seedIndex never called) has no gen=*
          // partitions and parquet schema inference would throw; treat
          // it as an empty index instead — the batch's own spanIndex
          // schema on zero rows.
          val root = new org.apache.hadoop.fs.Path(indexDir)
          val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
          val hasGens = fs.exists(root) && fs.listStatus(root)
            .exists(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
          val idxMin =
            if (!hasGens) spanIndex(cached.toDF().limit(0), idCol, textCol, k, w)
            else sp.read.parquet(indexDir)
              .filter(col("gen").cast("string") =!= lit(batchId.toString))
              .groupBy(col("fp"))
              .agg(min(col("doc_min")).as("doc_min"))
          probeBatch(idxMin, cached.toDF(), idCol, textCol, k, w)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          spanIndex(cached.toDF(), idCol, textCol, k, w)
            .write.mode("overwrite").parquet(s"$indexDir/gen=$batchId")
        } finally cached.unpersist(blocking = false)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }

  /** Fold the appended generations to one row per fingerprint — same
    * crash-safe generational discipline as DedupStream.compactIndex
    * (new `gen=c<k>` lands durably BEFORE superseded gens delete;
    * min-merge keeps every intermediate state correct). */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val oldGens = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
    val nextC = oldGens.map(_.getPath.getName.stripPrefix("gen="))
      .filter(_.matches("c\\d+")).map(_.drop(1).toLong)
      .foldLeft(0L)(math.max) + 1
    spark.read.parquet(indexDir)
      .groupBy(col("fp"))
      .agg(min(col("doc_min")).as("doc_min"))
      .write.mode("overwrite").parquet(s"$indexDir/gen=c$nextC")
    oldGens.foreach(s => fs.delete(s.getPath, true))
  }
}
