package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** SURVEY.md §2.3 (round 17), streaming form of the SUFFIX TIER —
  * the incremental MEM index: [[graft.operators.Dedup.memIndexMinSites]]
  * persisted generationally (the q103/DedupStream/SpanStream
  * append-only discipline), so each arriving batch answers "does any
  * of my documents share a ≥ L-token exact run with anything already
  * in the lake — and with which first occurrence, where, how long" at
  * DELTA cost: one narrow gram front over the batch + one equi-join
  * against the index. The batch path q323 recomputes the full MEM
  * enumeration corpus-wide; this is the admission-control form a
  * collection pipeline actually runs nightly.
  *
  * Per micro-batch (foreachBatch, checkpointed):
  *  1. read the gram index (all generations, min-of-rank-merged —
  *     min(rank) is associative, so any subset of generations gives a
  *     correct upper bound and the full set gives the exact first
  *     sites);
  *  2. gram the batch (narrow, one hash per token) and probe:
  *     [[graft.operators.Dedup.memProbe]] emits every maximal aligned
  *     run ≥ minLen vs the indexed first sites;
  *  3. write the batch's run rows to `out/batch=<id>`;
  *  4. append the batch's own (h, min rank) rows as `gen=<batchId>`.
  *
  * Exactly-once on replay: both writes are per-batch overwrite
  * partitions, and the probe EXCLUDES the batch's own generation so a
  * crash strictly between the two writes cannot make the replay
  * report every document as repeating itself (ScaleSpec replays a
  * planted half-committed generation).
  *
  * The index uses the LONG gram key by default (the round-17
  * production path — 8-byte shuffle/index rows); a lake index and its
  * probes must agree on the key, so `longKeys` is a constructor-time
  * choice persisted by whoever seeds the index.
  */
object MemStream {

  /** Seed indexDir from an existing corpus. Call once before [[run]]. */
  def seedIndex(corpus: DataFrame, indexDir: String,
                idCol: String, textCol: String,
                minLen: Int = 15, longKeys: Boolean = true): Unit =
    Dedup.memIndexMinSites(corpus, idCol, textCol, minLen, longKeys)
      .write.mode("overwrite").parquet(s"$indexDir/gen=seed")

  /** Drive the streaming MEM probe over the files currently in the
    * source (AvailableNow — the replay/test harness shape). */
  def run(docs: DataFrame, indexDir: String, outDir: String,
          checkpointDir: String, idCol: String, textCol: String,
          minLen: Int = 15, longKeys: Boolean = true): Unit = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        // persist the micro-batch: the probe and the index append both
        // read it — un-persisted they'd re-scan the source files (the
        // STRESS_r12 ingest-IO-amplification lesson)
        val cached = batch.persist()
        try {
          val root = new org.apache.hadoop.fs.Path(indexDir)
          val fs = root.getFileSystem(sp.sessionState.newHadoopConf())
          val hasGens = fs.exists(root) && fs.listStatus(root)
            .exists(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
          val idxMin =
            if (!hasGens)
              Dedup.memIndexMinSites(cached.toDF().limit(0), idCol, textCol,
                minLen, longKeys)
            else sp.read.parquet(indexDir)
              .filter(col("gen").cast("string") =!= lit(batchId.toString))
              .groupBy(col("h")).agg(min(col("rank")).as("rank"))
          Dedup.memProbe(idxMin, cached.toDF(), idCol, textCol, minLen, longKeys)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          Dedup.memIndexMinSites(cached.toDF(), idCol, textCol, minLen, longKeys)
            .write.mode("overwrite").parquet(s"$indexDir/gen=$batchId")
        } finally cached.unpersist(blocking = false)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }

  /** Fold the appended generations to one row per gram hash — the
    * SpanStream/DedupStream crash-safe compaction discipline: the new
    * `gen=c<k>` lands durably BEFORE superseded gens delete, and
    * min-merge keeps every intermediate state correct. */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val oldGens = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
    val nextC = oldGens.map(_.getPath.getName.stripPrefix("gen="))
      .filter(_.matches("c\\d+")).map(_.drop(1).toLong)
      .foldLeft(0L)(math.max) + 1
    spark.read.parquet(indexDir)
      .groupBy(col("h"))
      .agg(min(col("rank")).as("rank"))
      .write.mode("overwrite").parquet(s"$indexDir/gen=c$nextC")
    oldGens.foreach(s => fs.delete(s.getPath, true))
  }
}
