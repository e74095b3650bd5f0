package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional table snapshots — the commit-marker protocol
  * that makes a 100 TB parquet table safely publishable and readable
  * while writers run (the core of every lake table format, without
  * the format): each publish lands a full generation under
  * `gen=<n>/<datadir>/` and then creates the `gen=<n>/_COMMITTED`
  * marker; readers resolve the LATEST COMMITTED generation and read
  * only it. The marker create is the commit point — a writer that
  * dies mid-publish leaves a marker-less directory that no reader
  * will ever resolve (crash invisibility), and a retry publishes a
  * fresh generation rather than repairing a torn one.
  *
  * Round 12 additions:
  *  - DATA SKIPPING: [[publishStats]] / [[publishZOrdered]] write a
  *    per-file min/max stats manifest (`_STATS.tsv`, footer-harvested
  *    by [[SnapshotStats]]) into the generation BEFORE the marker, and
  *    [[readWhere]] prunes files against it before the scan — the
  *    read-path consumer of the Z-order layout.
  *  - MULTI-WRITER: [[publishConditional]] replaces the single-writer
  *    contract with a generation-fenced conditional commit. The CAS is
  *    `create(_CLAIM, overwrite=false)` — atomic on HDFS and object
  *    stores with preconditions — taken BEFORE the corpus-sized data
  *    write, so a losing writer loses cheaply and retries at the next
  *    generation. Each writer lands data in a writer-unique
  *    `data-<uuid>` directory and the commit marker NAMES that
  *    directory; readers resolve the data dir FROM the committed
  *    marker's content (empty marker = legacy `data`), so even on a
  *    filesystem whose create is not truly atomic no torn or mixed
  *    generation is ever readable — the worst outcome is orphaned
  *    `data-<uuid>` debris, which [[vacuum]] removes.
  *
  * Generations also give time travel ([[readAt]]) and a retention
  * window ([[vacuum]]) for free. The streaming family's per-batch
  * `gen=` partitions (DedupStream, RollupStream) are the multi-batch
  * refinement of this same discipline.
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

  /** Every generation DIRECTORY number, committed or not — conditional
    * writers must claim above debris, not just above commits.
    */
  private def allGenDirs(fs: FileSystem, dir: String): Seq[Long] = {
    val root = new Path(dir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .map(_.getPath.getName.stripPrefix("gen=").toLong)
      .sorted
  }

  /** Highest committed generation, or None for an empty table. */
  def currentGen(spark: SparkSession, dir: String): Option[Long] =
    committedGens(fsOf(dir, spark), dir).lastOption

  /** The data directory a committed generation's marker names (legacy
    * empty markers name `data`).
    */
  private def dataDirOf(fs: FileSystem, dir: String, gen: Long): String = {
    val marker = new Path(s"$dir/gen=$gen/_COMMITTED")
    val in = fs.open(marker)
    val content = try new String(in.readAllBytes(), UTF_8).trim finally in.close()
    if (content.isEmpty) "data" else content
  }

  private def writeMarker(fs: FileSystem, path: Path, content: String,
                          overwrite: Boolean): Unit = {
    val out = fs.create(path, overwrite)
    try out.write(content.getBytes(UTF_8)) finally out.close()
  }

  /** Publish `df` as the next generation; returns its number. The
    * data write is corpus-sized; the commit is one marker create.
    * Single-writer shape (the reference pipeline's nightly load);
    * concurrent writers need [[publishConditional]].
    */
  def publish(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val fs = fsOf(dir, spark)
    val gen = currentGen(spark, dir).getOrElse(0L) + 1L
    df.write.mode("overwrite").parquet(s"$dir/gen=$gen/data")
    writeMarker(fs, new Path(s"$dir/gen=$gen/_COMMITTED"), "", overwrite = true)
    gen
  }

  /** [[publish]] plus a footer-harvested per-file stats manifest, so
    * [[readWhere]] can data-skip. Manifest lands BEFORE the marker —
    * a crash leaves both invisible.
    */
  def publishStats(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val fs = fsOf(dir, spark)
    val gen = currentGen(spark, dir).getOrElse(0L) + 1L
    df.write.mode("overwrite").parquet(s"$dir/gen=$gen/data")
    SnapshotStats.writeManifest(spark, s"$dir/gen=$gen/data", s"$dir/gen=$gen/_STATS.tsv")
    writeMarker(fs, new Path(s"$dir/gen=$gen/_COMMITTED"), "", overwrite = true)
    gen
  }

  /** [[publishStats]] plus a per-file BLOOM POINT-INDEX on
    * `bloomCols` (`_BLOOM.tsv`, see [[BloomIndex]]): min/max stats
    * prune ranges on clustered columns; the Bloom tier prunes
    * EQUALITY probes on high-cardinality UNclustered columns, at the
    * documented cost of one extra data pass at publish time. Both
    * sidecars land BEFORE the marker — a crash leaves everything
    * invisible.
    */
  def publishStatsIndexed(df: DataFrame, dir: String,
                          bloomCols: Seq[String]): Long = {
    val spark = df.sparkSession
    val fs = fsOf(dir, spark)
    val gen = currentGen(spark, dir).getOrElse(0L) + 1L
    df.write.mode("overwrite").parquet(s"$dir/gen=$gen/data")
    SnapshotStats.writeManifest(spark, s"$dir/gen=$gen/data", s"$dir/gen=$gen/_STATS.tsv")
    BloomIndex.write(spark, s"$dir/gen=$gen/data", bloomCols,
      s"$dir/gen=$gen/_BLOOM.tsv")
    writeMarker(fs, new Path(s"$dir/gen=$gen/_COMMITTED"), "", overwrite = true)
    gen
  }

  /** Publish Z-ordered on (colA, colB) into `nFiles` files, with the
    * stats manifest. The write-side half of data skipping: Z-order
    * clustering makes each file's [min,max] interval tight in BOTH
    * dimensions, which is exactly what makes [[readWhere]]'s pruning
    * bite on either column's predicate.
    */
  def publishZOrdered(df: DataFrame, dir: String, colA: String, colB: String,
                      nFiles: Int): Long = {
    val spark = df.sparkSession
    val fs = fsOf(dir, spark)
    val gen = currentGen(spark, dir).getOrElse(0L) + 1L
    graft.operators.Layout.zorderWrite(df, s"$dir/gen=$gen/data", colA, colB, nFiles)
    SnapshotStats.writeManifest(spark, s"$dir/gen=$gen/data", s"$dir/gen=$gen/_STATS.tsv")
    writeMarker(fs, new Path(s"$dir/gen=$gen/_COMMITTED"), "", overwrite = true)
    gen
  }

  /** Generation-fenced CONDITIONAL commit for concurrent publishers.
    * Protocol per attempt at generation g:
    *  1. CAS-claim: `create(gen=g/_CLAIM, overwrite=false)` and write
    *     this writer's uuid. Claim taken ⇒ g is ours; claim exists ⇒
    *     another writer owns g, retry at g+1. The claim precedes the
    *     data write, so losers lose before paying the corpus-sized IO.
    *  2. Write data into the writer-UNIQUE `gen=g/data-<uuid>` — no
    *     two writers ever share a data directory.
    *  3. Harvest the stats manifest for that directory.
    *  4. Commit: create `_COMMITTED` (overwrite=false) naming
    *     `data-<uuid>`. Readers resolve the data dir from the marker,
    *     so only the named directory is ever visible.
    * A writer that dies after 1 leaves claim debris that conditional
    * writers skip (claims fence the generation number forever until
    * [[vacuum]]); after 2–3, additionally an invisible data dir.
    * Returns the committed generation number.
    */
  def publishConditional(df: DataFrame, dir: String, maxAttempts: Int = 64): Long = {
    val spark = df.sparkSession
    val fs = fsOf(dir, spark)
    fs.mkdirs(new Path(dir))
    val uuid = java.util.UUID.randomUUID().toString
    var attempt = 0
    var gen = allGenDirs(fs, dir).lastOption.getOrElse(0L) + 1L
    while (attempt < maxAttempts) {
      val genDir = s"$dir/gen=$gen"
      // Only "file already exists" means the claim race was lost; any
      // other IOException (network blip, permission) is a real failure
      // and must propagate, not silently burn attempts/generations.
      val claimed =
        try {
          writeMarker(fs, new Path(s"$genDir/_CLAIM"), uuid, overwrite = false)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        }
      if (claimed) {
        val dataDir = s"data-$uuid"
        df.write.mode("overwrite").parquet(s"$genDir/$dataDir")
        SnapshotStats.writeManifest(spark, s"$genDir/$dataDir", s"$genDir/_STATS.tsv")
        writeMarker(fs, new Path(s"$genDir/_COMMITTED"), dataDir, overwrite = false)
        return gen
      }
      attempt += 1
      gen = math.max(gen + 1, allGenDirs(fs, dir).lastOption.getOrElse(0L) + 1L)
    }
    throw new IllegalStateException(
      s"publishConditional lost $maxAttempts claim races in $dir — giving up")
  }

  /** Read the latest committed generation. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readAt(spark, dir,
      currentGen(spark, dir).getOrElse(
        throw new IllegalStateException(s"no committed generation in $dir")))

  /** Time travel: read a specific committed generation. */
  def readAt(spark: SparkSession, dir: String, gen: Long): DataFrame = {
    val fs = fsOf(dir, spark)
    require(fs.exists(new Path(s"$dir/gen=$gen/_COMMITTED")),
      s"generation $gen is not committed in $dir")
    spark.read.parquet(s"$dir/gen=$gen/${dataDirOf(fs, dir, gen)}")
  }

  /** Data-skipping read of the latest committed generation: prune
    * files whose stats prove the predicate cannot match, then scan
    * only the survivors WITH the full row-level predicate re-applied
    * — results are hash-identical to `read(...).filter(pred)` by
    * construction; pruning only changes how many files open. A
    * generation without a manifest (legacy [[publish]]) degrades to
    * the full filtered scan.
    */
  /** Top-level equality conjuncts of a predicate tree — the probes
    * the Bloom tier can use. Disjunction branches are NOT conjuncts
    * (an Or's equality only constrains one branch), so they stay
    * stats-pruned only: soundness over pruning power.
    */
  private def eqConjuncts(p: SnapshotStats.StatsPred): Seq[(String, Any)] =
    p match {
      case SnapshotStats.StatsPred.EqualTo(c, v) => Seq(c -> v)
      case SnapshotStats.StatsPred.And(l, r) => eqConjuncts(l) ++ eqConjuncts(r)
      case _ => Seq.empty
    }

  private def bloomKept(spark: SparkSession, dir: String, gen: Long,
                        pred: SnapshotStats.StatsPred,
                        files: Seq[String]): Seq[String] = {
    val eqs = eqConjuncts(pred)
    if (eqs.isEmpty) files
    else BloomIndex.read(spark, s"$dir/gen=$gen/_BLOOM.tsv") match {
      case None => files
      case Some(idx) =>
        files.filter(f => eqs.forall { case (c, v) =>
          BloomIndex.mayContain(idx, f, c, v)
        })
    }
  }

  def readWhere(spark: SparkSession, dir: String,
                pred: SnapshotStats.StatsPred): DataFrame = {
    val gen = currentGen(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed generation in $dir"))
    SnapshotStats.readManifest(spark, s"$dir/gen=$gen/_STATS.tsv") match {
      case None => readAt(spark, dir, gen).filter(pred.toColumn)
      case Some(stats) =>
        val kept = bloomKept(spark, dir, gen, pred,
          stats.filter(pred.mayMatch).map(_.file))
        if (kept.isEmpty)
          // schema-preserving empty frame: Catalyst folds this to an
          // empty LocalRelation, no file is opened
          readAt(spark, dir, gen).filter(org.apache.spark.sql.functions.lit(false))
        else spark.read.parquet(kept: _*).filter(pred.toColumn)
    }
  }

  /** (files kept, files total) the pruner would touch for `pred` on
    * the current generation — the observable SnapshotSpec and the
    * q212 audit assert on. Total 0 means "no manifest".
    */
  def pruneAudit(spark: SparkSession, dir: String,
                 pred: SnapshotStats.StatsPred): (Int, Int) = {
    val gen = currentGen(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed generation in $dir"))
    SnapshotStats.readManifest(spark, s"$dir/gen=$gen/_STATS.tsv") match {
      case None => (0, 0)
      case Some(stats) =>
        (bloomKept(spark, dir, gen, pred,
          stats.filter(pred.mayMatch).map(_.file)).size, stats.size)
    }
  }

  /** OPTIMIZE — rewrite the current generation into `targetFiles`
    * files and publish the result as a NEW generation (q221 plans the
    * bins; this executes the rewrite). The maintenance job every
    * 100 TB table needs: streaming sinks and per-partition writers
    * leave thousands of KB-scale files, and scan cost is per-FILE.
    * Content is IDENTICAL by construction (one read, one write, no
    * row-level transform — the spec pins hash parity); sidecars are
    * regenerated for the new layout — the stats manifest always, the
    * Bloom point-index for exactly the columns the previous
    * generation indexed (read from its `_BLOOM.tsv`), so point-probe
    * pruning survives compaction. Old generations remain readable
    * (time travel) until [[vacuum]] reclaims them — compaction is a
    * publish, never an in-place mutation.
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int): Long = {
    require(targetFiles >= 1, "need at least one output file")
    val gen = currentGen(spark, dir).getOrElse(
      throw new IllegalStateException(s"no committed generation in $dir"))
    val bloomCols: Seq[String] =
      BloomIndex.read(spark, s"$dir/gen=$gen/_BLOOM.tsv")
        .map(_.keys.map(_._2).toSeq.distinct.sorted)
        .getOrElse(Seq.empty)
    val df = readAt(spark, dir, gen).coalesce(targetFiles)
    if (bloomCols.isEmpty) publishStats(df, dir)
    else publishStatsIndexed(df, dir, bloomCols)
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
