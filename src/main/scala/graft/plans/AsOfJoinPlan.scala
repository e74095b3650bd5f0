package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** SURVEY.md §2.5 / §7 — a whole-operator Catalyst extension: sort-merge
  * AS-OF JOIN (logical node → planner strategy → physical exec),
  * registered through `GraftExtensions`.
  *
  * Semantics: for every left row, attach the single right row with the
  * greatest (rightTime, tieBreak) such that rightTime ≤ leftTime and
  * the equi-keys match; null-extended when no right row qualifies.
  *
  * Why a custom operator: the compositional form (equi-join on key +
  * time filter + row_number window — operators/Temporal.asofJoin)
  * materializes |left| × |per-key right history| intermediate rows
  * before the window discards all but one per left row. This exec
  * instead requires both children clustered on the key and sorted by
  * (key, time): each partition is then a single streaming merge with
  * O(1) carried state (the current best match), no fan-out, no window.
  * Same shuffle count as the join (one per side) — strictly less work
  * after it.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                    leftTime: Expression, rightTime: Expression,
                    tieBreak: Expression,
                    direction: Int = AsOfJoinPlan.Backward,
                    tolerance: Long = -1L)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tb, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, dir, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        tieBreak: Expression,
                        direction: Int = AsOfJoinPlan.Backward,
                        tolerance: Long = -1L)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides hashed on the equi-keys → co-partitioned merge
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true, None) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true, None) :: Nil

  // left sorted by (key, time); right by (key, time, tieBreak) so the
  // last qualifying row in scan order IS the (max time, max tie) pick
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime :+ tieBreak).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override lazy val metrics =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    // capture only serializable ingredients; projections/orderings are
    // built per-partition (they are not serializable themselves)
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTime = leftTime; val rTime = rightTime
    val dir = direction; val tol = tolerance
    // distance math needs raw epoch-micros — only read when the
    // extended semantics are in play (the API restricts those to
    // long-backed time types)
    val needsLong = dir != AsOfJoinPlan.Backward || tol >= 0L

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrdering =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrdering =
        RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val rightNulls = new GenericInternalRow(rOut.size)
      // bind against NULLABLE right attrs: the null-extended row must
      // be read with null checks even when the right child declares a
      // column non-nullable, or the projection reads 0 instead of null
      val outProj = UnsafeProjection.create(allOut,
        lOut ++ rOut.map(_.withNullability(true)))
      // SQL inequality/equi-join semantics under nulls: a null right
      // key or null right time can never satisfy `key = key AND
      // rt <= lt`, so such rows are dropped up front (the natural
      // ordering would otherwise treat null keys as equal and sort a
      // null time before everything, making it "≤" any left time)
      val rBuf = rIter.filter { r =>
        !rKeyProj(r).anyNull && !rTimeProj(r).isNullAt(0)
      }.buffered
      val joined = new JoinedRow
      var matchKey: InternalRow = null   // key of the buffered best match
      var bestMatch: InternalRow = null  // copied right row
      var bestTime: Long = 0L            // its epoch-micros (needsLong only)
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        // null-key / null-time left rows match nothing: null-extend
        if (lKey.anyNull || lTimeProj(lRow).isNullAt(0)) {
          numOutputRows += 1
          outProj(joined(lRow, rightNulls))
        } else {
          val lTimeVal = lTimeProj(lRow).copy()
          val lT = if (needsLong) lTimeVal.getLong(0) else 0L
          // drop right rows (and any stale match) for keys before lKey
          while (rBuf.hasNext && keyOrdering.compare(rKeyProj(rBuf.head), lKey) < 0)
            rBuf.next()
          if (matchKey != null && keyOrdering.compare(matchKey, lKey) != 0) {
            matchKey = null; bestMatch = null
          }
          // consume qualifying right rows (same key, time ≤ lTime);
          // scan order makes the last one the (max time, max tie) match
          var continue = true
          while (continue && rBuf.hasNext) {
            val head = rBuf.head
            val rKey = rKeyProj(head)
            if (keyOrdering.compare(rKey, lKey) == 0 &&
              timeOrdering.compare(rTimeProj(head), lTimeVal) <= 0) {
              if (needsLong) bestTime = rTimeProj(head).getLong(0)
              bestMatch = rBuf.next().copy()
              matchKey = lKey.copy()
            } else continue = false
          }
          val backRow =
            if (matchKey != null && keyOrdering.compare(matchKey, lKey) == 0) bestMatch
            else null
          // after the consume loop rBuf.head (same key) is STRICTLY
          // after lTime and, by the (time, tieBreak) sort, the
          // smallest such row — the forward candidate
          val chosen: InternalRow =
            if (dir == AsOfJoinPlan.Backward) {
              if (backRow != null && (tol < 0L || lT - bestTime <= tol)) backRow
              else null
            } else {
              val fRow =
                if (rBuf.hasNext && keyOrdering.compare(rKeyProj(rBuf.head), lKey) == 0)
                  rBuf.head
                else null
              val fT = if (fRow != null) rTimeProj(fRow).getLong(0) else 0L
              val fOk = fRow != null && (tol < 0L || fT - lT <= tol)
              if (dir == AsOfJoinPlan.Forward) { if (fOk) fRow else null }
              else { // nearest: closer side wins, ties go backward
                val bOk = backRow != null && (tol < 0L || lT - bestTime <= tol)
                if (bOk && fOk) { if (lT - bestTime <= fT - lT) backRow else fRow }
                else if (bOk) backRow
                else if (fOk) fRow
                else null
              }
            }
          numOutputRows += 1
          outProj(joined(lRow, if (chosen == null) rightNulls else chosen))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

object AsOfJoinPlan {

  val Backward = 0
  val Forward = 1
  val Nearest = 2

  /** DataFrame-level API. Registers the planner strategy in the
    * session on first use (also installable ahead of time via
    * `GraftExtensions`). Columns are referenced by name against each
    * side's analyzed output.
    *
    * Round-7 extension — the pandas `merge_asof` surface:
    *  - `direction`: "backward" (default — greatest rightTime ≤
    *    leftTime), "forward" (smallest rightTime STRICTLY after
    *    leftTime — the next-event attribution shape), or "nearest"
    *    (closer of the two, ties backward);
    *  - `toleranceMicros`: inclusive bound on the time distance; -1
    *    disables. Non-qualifying left rows null-extend as before.
    * Both extensions require long-backed time columns (TimestampType
    * or LongType epoch-micros) because they do distance arithmetic.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               tieBreak: String,
               direction: String = "backward",
               toleranceMicros: Long = -1L): DataFrame = {
    val dir = direction match {
      case "backward" => Backward
      case "forward"  => Forward
      case "nearest"  => Nearest
      case other => throw new IllegalArgumentException(
        s"direction must be backward|forward|nearest, got '$other'")
    }
    val spark = left.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output.map(_.name)}"))
    val lt = attr(lPlan, leftTime); val rt = attr(rPlan, rightTime)
    if (dir != Backward || toleranceMicros >= 0L) {
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      Seq(lt.dataType, rt.dataType).foreach { t =>
        require(t == TimestampType || t == TimestampNTZType || t == LongType,
          s"direction/tolerance need a timestamp or LongType time column, got $t")
      }
    }
    val plan = AsOfJoin(lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      lt, rt, attr(rPlan, tieBreak), dir, toleranceMicros)
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, plan)
  }
}
