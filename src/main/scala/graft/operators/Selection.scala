package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Caching.ScopedPersist

/** Budgeted greedy selection — "fill a 10B-token budget with the best
  * documents": rank rows by a TOTAL order, keep rows while the running
  * weight total stays within budget. The curation step between scoring
  * and training-shard export.
  */
object Selection {

  /** The running sum is a DISTRIBUTED prefix sum, never a
    * single-partition global window (the naive `Window.orderBy(...)`
    * with no partitioning funnels the whole corpus through one task —
    * a non-starter at 100 TB): range-repartition on the sort key (so
    * partition i wholly precedes partition i+1), partition-local
    * cumulative window, then each partition's grand total — a
    * numPartitions-row table — is prefix-summed and broadcast-joined
    * back as the partition's offset. Output `cum_weight` values are
    * partition-count-independent: exact integer sums over a total
    * order.
    *
    * `sortCols` must be a total order (break ties — e.g. append the
    * id) or the cumulative sums are not well-defined.
    */
  def budgetSelect(df: DataFrame, sortCols: Seq[Column], weight: Column,
                   budget: Long, numPartitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "sortCols must be a total order")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("__w", weight.cast("long"))
      .withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Persisted: the offsets branch and the main branch both read this
    // frame, and both must see the SAME range-partition assignment.
    // Without the persist that only holds via exchange reuse /
    // deterministic boundary sampling — an optimizer accident, not a
    // guarantee. One materialization pins __pid for both consumers.
    val withLocal = ranged.withColumn("__cum_local", sum(col("__w")).over(local))
      .scopedPersist()
    // per-partition totals: ≤ numPartitions rows — the single-task
    // window over THIS table is a handful of longs, not the corpus
    val offWin = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withLocal.groupBy(col("__pid"))
      .agg(sum(col("__w")).as("__ptotal"))
      .withColumn("__offset", coalesce(sum(col("__ptotal")).over(offWin), lit(0L)))
      .select(col("__pid"), col("__offset"))
    withLocal.join(broadcast(offsets), Seq("__pid"))
      .withColumn("cum_weight", col("__cum_local") + col("__offset"))
      .filter(col("cum_weight") <= budget)
      .drop("__pid", "__w", "__cum_local", "__offset")
  }

  /** GROUPED distributed prefix sum: `cum_weight` = running total of
    * `weight` within each `groupCols` group, ordered by `sortCols` —
    * without ever putting one group through one task (the
    * `Window.partitionBy(group)` shape is a scale hazard when groups
    * are few and huge: 5 aspect buckets over a 100 TB corpus is
    * corpus/5 rows per window task). Same discipline as
    * [[budgetSelect]]: range-repartition on (group, sort) so each
    * group's rows occupy a contiguous partition run, partition-local
    * windows, then per-(partition, group) totals — ≤ parts × groups
    * rows — prefix-summed per group and broadcast back as offsets.
    * Exact integer sums over a total order: output is
    * partition-count-independent (the invariance bar).
    *
    * `sortCols` must totally order rows WITHIN a group.
    */
  def groupedPrefixSum(df: DataFrame, groupCols: Seq[Column],
                       sortCols: Seq[Column], weight: Column,
                       numPartitions: Int = 0): DataFrame = {
    require(groupCols.nonEmpty && sortCols.nonEmpty,
      "groupCols and sortCols must be non-empty")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val rangeKeys = groupCols ++ sortCols
    val ranged = df.repartitionByRange(parts, rangeKeys: _*)
      .withColumn("__w", weight.cast("long"))
      .withColumn("__pid", spark_partition_id())
    val gNames = groupCols.indices.map(i => s"__g$i")
    val tagged = gNames.zip(groupCols).foldLeft(ranged) {
      case (acc, (n, c)) => acc.withColumn(n, c)
    }
    val local = Window.partitionBy((col("__pid") +: gNames.map(col)): _*)
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one materialization pins __pid for both consumers (see budgetSelect)
    val withLocal = tagged.withColumn("__cum_local", sum(col("__w")).over(local))
      .scopedPersist()
    // per-(partition, group) totals: ≤ parts × |groups| rows; the
    // offset window partitions by GROUP over this tiny table only
    val offWin = Window.partitionBy(gNames.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-safe (<=>) on the group keys: a NULL group is a legitimate
    // group for a general operator — plain equality would silently
    // drop its rows from the output
    val oNames = gNames.map(n => s"__o$n")
    val offsets = withLocal.groupBy((col("__pid") +: gNames.map(col)): _*)
      .agg(sum(col("__w")).as("__ptotal"))
      .withColumn("__offset", coalesce(sum(col("__ptotal")).over(offWin), lit(0L)))
      .select((col("__pid").as("__opid") +:
        gNames.zip(oNames).map { case (g, o) => col(g).as(o) }) :+
        col("__offset"): _*)
    val joinCond = gNames.zip(oNames)
      .map { case (g, o) => col(g) <=> col(o) }
      .foldLeft(col("__pid") === col("__opid"))(_ && _)
    withLocal.join(broadcast(offsets), joinCond)
      .withColumn("cum_weight", col("__cum_local") + col("__offset"))
      .drop((Seq("__pid", "__opid", "__w", "__cum_local", "__offset") ++
        gNames ++ oNames): _*)
  }
}
