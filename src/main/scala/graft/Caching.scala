package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Block-lifetime plumbing for the library contract: operators that
  * persist or checkpoint intermediates must not leak those blocks for
  * the lifetime of the session. Two mechanisms:
  *
  *  1. [[releaseCheckpoint]] — frees the BlockManager blocks behind a
  *     `localCheckpoint`'ed DataFrame once a NEWER checkpoint has
  *     materialized. Iterative operators (connected components,
  *     PageRank, BFS) checkpoint a new labels/ranks table every round;
  *     without an explicit release the superseded tables sit in
  *     executor storage until ContextCleaner GC happens to run — at
  *     100 TB a 50-round loop would hold up to 50 copies of the label
  *     table, an OOM rather than a slowdown.
  *  2. [[CacheScope]] — a scope that collects the `persist()` calls an
  *     operator makes while BUILDING a lazy plan (lambda barriers,
  *     shared join sides), so a caller can run
  *     `CacheScope.withScope { op(...).count() }` and get every
  *     intermediate unpersisted on exit. Outside any scope the persist
  *     behaves exactly as before (caller-must-clear contract, e.g. via
  *     `spark.catalog.clearCache()` between queries, as Bench does).
  */
object Caching {

  /** Checkpoint a loop round. Default path is `localCheckpoint` — the
    * right call in a single-process session, no FS round-trip. But a
    * locally-checkpointed block lives ONLY on its executor: on a real
    * cluster one executor loss or memory-pressure eviction mid-loop
    * kills the job unrecoverably ("RDD was locally checkpointed …
    * cannot be recomputed"). So when the session conf
    * `spark.graft.checkpointDir` is set (an HDFS/S3/posix path), the
    * iterative family (connected components, PageRank, BFS, BPE)
    * switches to RELIABLE `checkpoint()` rooted there and every round
    * survives executor loss. The SparkContext checkpoint dir is set
    * from the conf on first use (Spark appends a per-app UUID subdir,
    * so concurrent apps sharing the root don't collide).
    *
    * Semantics are unchanged either way: lazy rounds materialize
    * inside the loop's next action, eager rounds run their own job,
    * and [[releaseCheckpoint]] stays correct (reliable rounds fall
    * back to their files; its unpersist of an unpersisted RDD is a
    * no-op). Checkpoint FILES of superseded rounds are reclaimed by
    * the ContextCleaner when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is on, or by
    * deleting the app's subdir after the job — they are bounded by
    * rounds × table size either way.
    */
  def loopCheckpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    val sp = df.sparkSession
    sp.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) =>
        val sc = sp.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }

  /** Unpersist the checkpointed RDD blocks under `df`'s analyzed plan.
    * Safe once a downstream checkpoint has materialized: later plans
    * read the NEWEST checkpoint's blocks only, so superseded rounds
    * can be freed. (Same fault-tolerance profile as `localCheckpoint`
    * itself — blocks are the source of truth, lineage is truncated.)
    */
  def releaseCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Thread-local registry of operator-internal persists. Plan
    * construction and the scope exit must happen on the same thread
    * (the normal query-building pattern); actions may run anywhere.
    */
  object CacheScope {
    private val active = new ThreadLocal[mutable.Buffer[DataFrame]]

    /** Persist `df` and, when a scope is active on this thread,
      * register it for unpersist at scope exit.
      */
    private[graft] def persist(df: DataFrame): DataFrame = {
      df.persist()
      Option(active.get()).foreach(_ += df)
      df
    }

    /** Run `body`, then unpersist every operator-internal persist it
      * registered. Nested scopes release only their own persists.
      */
    def withScope[A](body: => A): A = {
      val outer = active.get()
      val buf = mutable.Buffer.empty[DataFrame]
      active.set(buf)
      try body
      finally {
        active.set(outer)
        buf.foreach(_.unpersist(blocking = false))
        // registrations also bubble to an enclosing scope's ledger?
        // No — each scope owns exactly what it registered; an outer
        // scope must not double-unpersist an inner scope's frames.
      }
    }
  }

  /** `df.scopedPersist()` — drop-in for `.persist()` at operator
    * internals that should participate in [[CacheScope]].
    */
  implicit class ScopedPersist(private val df: DataFrame) extends AnyVal {
    def scopedPersist(): DataFrame = CacheScope.persist(df)
  }

  /** Round 17 (guide §2.5 input skew / §1.2 per-task work): fan a
    * frame out to the session's parallelism — but ONLY when its
    * planned partition count is below it. Compute-heavy single-pass
    * aggregates (PCA moments, per-iteration gradients) otherwise run
    * their partials on however many input splits the scan produced;
    * a single small parquet file (one row group) is ONE split, so the
    * whole reduction runs on one core regardless of cluster size. At
    * real scale the scan has ≥ parallelism splits and this is a no-op
    * — the condition is derived from the actual plan, not a local
    * constant. Callers must only use it where the downstream result
    * is partitioning-invariant (the exact-decimal aggregate family).
    */
  implicit class FanOut(private val df: DataFrame) extends AnyVal {
    def fanOutSmallScan(): DataFrame = {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }

  /** `df.loopCheckpoint(eager)` — drop-in for `.localCheckpoint(eager)`
    * at iterative-loop rounds that should honor the reliable-
    * checkpoint policy ([[Caching.loopCheckpoint]]).
    */
  implicit class LoopCheckpoint(private val df: DataFrame) extends AnyVal {
    def loopCheckpoint(eager: Boolean = true): DataFrame =
      Caching.loopCheckpoint(df, eager)
  }
}
