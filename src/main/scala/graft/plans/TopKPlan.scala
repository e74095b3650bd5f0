package graft.plans

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Cast, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** SURVEY.md §2.5 #54 — the third whole-operator Catalyst extension
  * (after [[AsOfJoinPlan]] and [[HammingJoinPlan]]): native PER-KEY
  * TOP-K (logical node → planner strategy → physical exec).
  *
  * Semantics: for each distinct grouping key, the k rows with the
  * highest score (ties broken by the ascending tie column — a total
  * order, so the result is deterministic), each tagged with its rank
  * 1..k. Identical contract to the ubiquitous
  * `row_number().over(Window.partitionBy(key).orderBy(desc)) <= k`
  * formulation (q73 / q81 / q10 / q20 all use the window shape).
  *
  * Why a custom operator: the window plan shuffles EVERY row on the
  * key and then fully sorts every partition — at 100 TB the sort I/O
  * and shuffle volume are proportional to the corpus, even though
  * only k rows per key survive. This exec makes top-k ALGEBRAIC
  * (partial ⇒ merge, like a partial aggregate):
  *
  *  - map-side, each input partition keeps a bounded min-heap of at
  *    most k rows per key (the partial top-k); a hash-map cap bounds
  *    memory on high-cardinality keys — when more than
  *    `maxKeysInFlight` distinct keys are resident the state flushes
  *    downstream and rebuilds, exactly the hash-aggregate
  *    partial-fallback discipline, correct because the final stage
  *    re-selects;
  *  - ONE internal shuffle moves only the surviving ≤ k rows per
  *    (key, input partition) — for a corpus-scale scan this is the
  *    difference between shuffling the dataset and shuffling a
  *    k-bounded sketch of it;
  *  - `repartitionAndSortWithinPartitions` on (key, score desc, tie)
  *    delivers each key as one contiguous best-first run, so the
  *    final pass emits rank 1..k with O(1) state and no further sort
  *    or shuffle.
  *
  * The score is evaluated as DOUBLE and the tie-break as LONG (cast
  * injected by the DataFrame wrapper); rows where key, score, or tie
  * evaluate to null are dropped (window row_number keeps them only
  * with an explicit null ordering — callers filter first, as all the
  * graft window queries already do).
  */
case class TopKPerKey(child: LogicalPlan, keys: Seq[Expression],
                      score: Expression, tie: Expression,
                      k: Int, maxKeysInFlight: Int,
                      rnk: Attribute)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnk
  override def producedAttributes: AttributeSet = AttributeSet(rnk :: Nil)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(child, keys, score, tie, k, maxKeys, rnk) =>
      TopKPerKeyExec(planLater(child), keys, score, tie, k, maxKeys, rnk) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(child: SparkPlan, keys: Seq[Expression],
                          score: Expression, tie: Expression,
                          k: Int, maxKeysInFlight: Int,
                          rnk: Attribute)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnk
  override def producedAttributes: AttributeSet = AttributeSet(rnk :: Nil)

  override lazy val metrics =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  /** Total order over shuffle keys: key bytes lexicographic (any
    * consistent order groups equal keys — UnsafeRow equality is byte
    * equality), then score DESC, then tie ASC, so each key arrives as
    * a best-first contiguous run. */
  private def shuffleOrdering: Ordering[(UnsafeRow, Double, Long)] =
    new Ordering[(UnsafeRow, Double, Long)] {
      override def compare(a: (UnsafeRow, Double, Long), b: (UnsafeRow, Double, Long)): Int = {
        val ka = a._1.getBytes; val kb = b._1.getBytes
        val n = math.min(ka.length, kb.length)
        var i = 0
        while (i < n) {
          val c = (ka(i) & 0xff) - (kb(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        if (ka.length != kb.length) return ka.length - kb.length
        val sc = java.lang.Double.compare(b._2, a._2)
        if (sc != 0) sc else java.lang.Long.compare(a._3, b._3)
      }
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val childOut = child.output
    val keyEs = keys; val scoreE = score; val tieE = tie
    val kk = k; val maxKeys = maxKeysInFlight
    val parts = conf.numShufflePartitions

    // ---- stage 1: map-side partial top-k ------------------------------
    val partial: RDD[((UnsafeRow, Double, Long), UnsafeRow)] =
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyEs, childOut)
        val ordProj = UnsafeProjection.create(
          Seq(Cast(scoreE, DoubleType), Cast(tieE, LongType)), childOut)
        val rowProj = UnsafeProjection.create(childOut, childOut)

        // per key: min-heap whose head is the WORST kept row
        // (lowest score, then largest tie) — O(log k) insert/evict.
        final class Entry(val score: Double, val tie: Long, val row: UnsafeRow)
        val worstFirst = new java.util.Comparator[Entry] {
          override def compare(x: Entry, y: Entry): Int = {
            val c = java.lang.Double.compare(x.score, y.score)
            if (c != 0) c else java.lang.Long.compare(y.tie, x.tie)
          }
        }
        val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[Entry]]()

        def drain(): Iterator[((UnsafeRow, Double, Long), UnsafeRow)] = {
          import scala.jdk.CollectionConverters._
          val snapshot = heaps.entrySet().iterator().asScala.flatMap { e =>
            val key = e.getKey
            e.getValue.iterator().asScala.map(en => ((key, en.score, en.tie), en.row))
          }.toArray
          heaps.clear()
          snapshot.iterator
        }

        val inserted = iter.flatMap { row =>
          val ord = ordProj(row)
          val keyRaw = keyProj(row)
          if (ord.isNullAt(0) || ord.isNullAt(1) || keyRaw.anyNull) Iterator.empty
          else {
            val s = ord.getDouble(0); val t = ord.getLong(1)
            var heap = heaps.get(keyRaw)
            var flushed: Iterator[((UnsafeRow, Double, Long), UnsafeRow)] = Iterator.empty
            if (heap == null) {
              if (heaps.size() >= maxKeys) flushed = drain() // partial-fallback flush
              heap = new java.util.PriorityQueue[Entry](kk, worstFirst)
              heaps.put(keyRaw.copy(), heap)
            }
            if (heap.size() < kk) heap.add(new Entry(s, t, rowProj(row).copy()))
            else {
              val worst = heap.peek()
              if (s > worst.score || (s == worst.score && t < worst.tie)) {
                heap.poll()
                heap.add(new Entry(s, t, rowProj(row).copy()))
              }
            }
            flushed
          }
        }
        inserted ++ drain() // Iterator.++ is by-name: drains after input ends
      }

    // ---- stage 2: ONE shuffle of the k-bounded partials --------------
    val partitioner = new Partitioner {
      override def numPartitions: Int = parts
      override def getPartition(key: Any): Int = {
        val h = key.asInstanceOf[(UnsafeRow, Double, Long)]._1.hashCode % parts
        if (h < 0) h + parts else h
      }
    }
    implicit val ord: Ordering[(UnsafeRow, Double, Long)] = shuffleOrdering
    val sorted = partial.repartitionAndSortWithinPartitions(partitioner)

    // ---- stage 3: streaming rank 1..k per contiguous key run ---------
    val outTypes = output.map(_.dataType).toArray
    sorted.mapPartitions { it =>
      val outProj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val rnkRow = new GenericInternalRow(1)
      var curKey: UnsafeRow = null
      var emitted = 0
      it.flatMap { case ((key, _, _), row) =>
        if (curKey == null || !curKey.equals(key)) { curKey = key; emitted = 0 }
        if (emitted < kk) {
          emitted += 1
          rnkRow.setInt(0, emitted)
          numOutputRows += 1
          Iterator.single(outProj(joined(row, rnkRow)))
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKPlan {

  /** DataFrame-level API: all of df's columns plus `rnk` (1-based,
    * IntegerType) for the k best rows per key. `scoreCol` must be
    * numerically total-ordered as a double (DECIMAL(12,2) money and
    * int counts are double-exact); `tieCol` must be castable to long
    * and unique within (key, score) for a deterministic result.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], scoreCol: String,
                 tieCol: String, k: Int,
                 maxKeysInFlight: Int = 1 << 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxKeysInFlight >= 1, s"maxKeysInFlight must be >= 1, got $maxKeysInFlight")
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${plan.output.map(_.name)}"))
    val rnk = AttributeReference("rnk", IntegerType, nullable = false)()
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark,
      TopKPerKey(plan, keyCols.map(attr), attr(scoreCol), attr(tieCol),
        k, maxKeysInFlight, rnk))
  }
}
