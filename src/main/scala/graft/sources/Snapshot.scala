package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional table snapshots — the commit-marker protocol
  * that makes a 100 TB parquet table safely publishable and readable
  * while writers run (the core of every lake table format, without
  * the format): each publish lands a full generation under
  * `gen=<n>/data/` and then creates the empty `gen=<n>/_COMMITTED`
  * marker; readers resolve the LATEST COMMITTED generation and read
  * only it. The marker create is the commit point — a writer that
  * dies mid-publish leaves a marker-less directory that no reader
  * will ever resolve (crash invisibility), and a retry publishes a
  * fresh generation rather than repairing a torn one.
  *
  * Generations also give time travel ([[readAt]]) and a retention
  * window ([[vacuum]]) for free. Single-writer-at-a-time is the
  * contract (the reference pipeline's nightly-load shape); the
  * streaming family's per-batch `gen=` partitions (DedupStream,
  * RollupStream) are the multi-batch refinement of this same
  * discipline.
  */
object Snapshot {

  private def fsOf(dir: String, spark: SparkSession): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedGens(fs: FileSystem, dir: String): Seq[Long] = {
    val root = new Path(dir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
      .filter(g => fs.exists(new Path(s"$dir/gen=$g/_COMMITTED")))
      .sorted
  }

  /** Highest committed generation, or None for an empty table. */
  def currentGen(spark: SparkSession, dir: String): Option[Long] =
    committedGens(fsOf(dir, spark), dir).lastOption

  /** Publish `df` as the next generation; returns its number. The
    * data write is corpus-sized; the commit is one marker create.
    */
  def publish(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val fs = fsOf(dir, spark)
    val gen = currentGen(spark, dir).getOrElse(0L) + 1L
    df.write.mode("overwrite").parquet(s"$dir/gen=$gen/data")
    fs.create(new Path(s"$dir/gen=$gen/_COMMITTED"), true).close()
    gen
  }

  /** Read the latest committed generation. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readAt(spark, dir,
      currentGen(spark, dir).getOrElse(
        throw new IllegalStateException(s"no committed generation in $dir")))

  /** Time travel: read a specific committed generation. */
  def readAt(spark: SparkSession, dir: String, gen: Long): DataFrame = {
    require(fsOf(dir, spark).exists(new Path(s"$dir/gen=$gen/_COMMITTED")),
      s"generation $gen is not committed in $dir")
    spark.read.parquet(s"$dir/gen=$gen/data")
  }

  /** Drop all but the newest `keep` committed generations (plus any
    * uncommitted debris older than the newest committed one).
    */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 2): Unit = {
    require(keep >= 1, "must keep at least the current generation")
    val fs = fsOf(dir, spark)
    val committed = committedGens(fs, dir)
    val cutoff = committed.takeRight(keep).headOption.getOrElse(return)
    val root = new Path(dir)
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .filter(_.getPath.getName.stripPrefix("gen=").toLong < cutoff)
      .foreach(s => fs.delete(s.getPath, true))
  }
}
