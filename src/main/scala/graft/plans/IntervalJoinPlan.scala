package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** SURVEY.md §2.5 — the fourth whole-operator Catalyst extension: a
  * sort-merge INTERVAL JOIN (logical node → planner strategy →
  * physical exec), registered through `GraftExtensions`.
  *
  * Semantics: inner join on equi-keys with the time-band predicate
  * `loMicros ≤ leftTime − rightTime ≤ hiMicros` (the Flink interval
  * join / q75 stream–stream attribution shape, in batch). Every
  * qualifying pair is emitted exactly once.
  *
  * Why a custom operator: Spark plans `key = key AND rt BETWEEN ...`
  * as a sort-merge equi-join whose inner loop buffers the ENTIRE
  * right key group and re-scans it per left row, applying the band
  * predicate as a post-filter — O(|L_k|·|R_k|) comparisons per key
  * however narrow the band. The composed alternative (q51's banded
  * self-join) bounds the work but pays a band fan-out and, for pair
  * queries, a distinct. This exec requires both children clustered on
  * the key and sorted by (key, time); each partition is then one
  * streaming merge holding only the ACTIVE WINDOW of right rows
  * (those with rt ∈ [lt − hi, lt − lo]) in a deque — ingested once,
  * evicted once, O(band occupancy) memory, no fan-out, no distinct,
  * no re-scan beyond the window. Same shuffle count as the equi-join;
  * strictly less work after it — exactly how the streaming
  * stream–stream interval join bounds its state, applied to batch.
  */
case class IntervalJoin(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        loMicros: Long, hiMicros: Long)
    extends BinaryNode {
  require(loMicros <= hiMicros, s"empty band: [$loMicros, $hiMicros]")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): IntervalJoin =
    copy(left = l, right = r)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, lk, rk, lt, rt, lo, hi) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, lo, hi) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(left: SparkPlan, right: SparkPlan,
                            leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                            leftTime: Expression, rightTime: Expression,
                            loMicros: Long, hiMicros: Long)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true, None) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true, None) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override lazy val metrics =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val lo = loMicros; val hi = hiMicros

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrdering =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val outProj = UnsafeProjection.create(allOut, lOut ++ rOut)
      // inner-join null semantics: a null key or null time satisfies
      // neither the equi nor the band predicate — drop rows up front
      // so the natural ordering never treats nulls as joinable
      val rBuf = rIter.filter { r =>
        !rKeyProj(r).anyNull && !rTimeProj(r).isNullAt(0)
      }.buffered
      val joined = new JoinedRow
      // the active window: right rows of the current key, in rt order
      val window = new scala.collection.mutable.ArrayDeque[(Long, InternalRow)]()
      var bufKey: InternalRow = null // key the window belongs to
      lIter.filter { l =>
        !lKeyProj(l).anyNull && !lTimeProj(l).isNullAt(0)
      }.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        val lT = lTimeProj(lRow).getLong(0)
        if (bufKey != null && keyOrdering.compare(bufKey, lKey) != 0) {
          window.clear(); bufKey = null
        }
        // skip right rows of keys before lKey
        while (rBuf.hasNext && keyOrdering.compare(rKeyProj(rBuf.head), lKey) < 0)
          rBuf.next()
        // ingest same-key right rows up to the top of the band
        var continue = true
        while (continue && rBuf.hasNext) {
          val head = rBuf.head
          if (keyOrdering.compare(rKeyProj(head), lKey) == 0 &&
            rTimeProj(head).getLong(0) <= lT - lo) {
            val rt = rTimeProj(head).getLong(0)
            window.append((rt, rBuf.next().copy()))
            bufKey = lKey.copy()
          } else continue = false
        }
        // evict rows that fell out of the bottom of the band
        while (window.nonEmpty && window.head._1 < lT - hi)
          window.removeHead()
        numOutputRows += window.size
        window.iterator.map { case (_, rRow) => outProj(joined(lRow, rRow)) }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): IntervalJoinExec =
    copy(left = l, right = r)
}

object IntervalJoinPlan {

  /** DataFrame-level API. Emits every (l, r) pair with matching keys
    * and `loMicros ≤ l.time − r.time ≤ hiMicros` (inclusive bounds;
    * negative lo reaches into the right side's future). Registers the
    * planner strategy on first use (also installable ahead of time
    * via `GraftExtensions`). Time columns must be long-backed
    * (TimestampType / TimestampNTZType / LongType epoch-micros) —
    * the band is distance arithmetic.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTime: String, rightTime: String,
                   loMicros: Long, hiMicros: Long): DataFrame = {
    val spark = left.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val lt = attr(lPlan, leftTime); val rt = attr(rPlan, rightTime)
    Seq(lt.dataType, rt.dataType).foreach { t =>
      require(t == TimestampType || t == TimestampNTZType || t == LongType,
        s"interval join needs a timestamp or LongType time column, got $t")
    }
    val plan = IntervalJoin(lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      lt, rt, loMicros, hiMicros)
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, plan)
  }
}
