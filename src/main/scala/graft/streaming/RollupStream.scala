package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Streaming MATERIALIZED VIEW maintenance — q135's incremental
  * aggregate merge driven by a stream: each micro-batch's partial
  * rollup (count + max, algebraic state) merges into the stored
  * per-key aggregate with a full-outer combine. Work per batch is
  * delta-sized + aggregate-sized; the event history is never
  * rescanned — the streaming answer to "keep the nightly rollup
  * current without the nightly scan".
  *
  * Crash-safety is GENERATIONAL, the DedupStream discipline, because
  * a stored aggregate is not append-only (a plain overwrite that
  * crashes mid-write loses the whole view):
  *   - batch N reads the newest `gen=<k>` with k < N, merges, writes
  *     `gen=<N>`, and only THEN deletes older generations;
  *   - if `gen=<N>` already exists the batch is a checkpoint REPLAY
  *     of a commit that finished — it is skipped, so a crash between
  *     the write and the cleanup cannot double-merge;
  *   - stragglers from such a crash are removed by the next batch's
  *     cleanup. Readers always take the max generation.
  * All moves go through the Hadoop FS API (HDFS/S3-safe), no local
  * java.nio, no directory swap.
  */
object RollupStream {

  private def gens(fs: org.apache.hadoop.fs.FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)

  /** Read the current view (newest generation), or None if empty. */
  def currentView(spark: org.apache.spark.sql.SparkSession,
                  outDir: String): Option[DataFrame] = {
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    gens(fs, root).sorted.lastOption
      .map(g => spark.read.parquet(s"$outDir/gen=$g"))
  }

  def run(events: DataFrame, keyCol: String, timeCol: String,
          outDir: String, checkpointDir: String): Unit = {
    def rollup(df: DataFrame): DataFrame = df
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        max(unix_micros(col(timeCol).cast("timestamp"))).as("last_ts_us"))
    val q = events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val root = new Path(outDir)
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        val existing = gens(fs, root)
        if (!existing.contains(batchId)) {
          val base = existing.filter(_ < batchId).sorted.lastOption
            .map(g => spark.read.parquet(s"$outDir/gen=$g"))
          val delta = rollup(batch)
          val merged = base match {
            case None => delta
            case Some(b) =>
              b.select(col(keyCol), col("n_events").as("bn"),
                  col("last_ts_us").as("bl"))
                .join(delta.select(col(keyCol), col("n_events").as("dn"),
                  col("last_ts_us").as("dl")), Seq(keyCol), "full_outer")
                .select(col(keyCol),
                  (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
                    .as("n_events"),
                  greatest(col("bl"), col("dl")).as("last_ts_us"))
          }
          merged.write.mode("overwrite").parquet(s"$outDir/gen=$batchId")
          // cleanup LAST: the new generation is durable before any
          // old one disappears, so every intermediate state reads
          existing.filter(_ < batchId)
            .foreach(g => fs.delete(new Path(s"$outDir/gen=$g"), true))
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
