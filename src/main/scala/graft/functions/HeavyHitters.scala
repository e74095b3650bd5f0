package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving sketch (Metwally et al., ICDT'05): bounded-memory
  * approximate heavy hitters. `capacity` counters track candidate
  * frequent items; every item's true count is ≥ (est − err) and
  * ≤ est. Mergeable ⇒ works as map-side partial state at 100 TB —
  * the frequent-token / boilerplate-n-gram mining pass of a training
  * corpus without a full groupBy of the token space.
  */
final class SpaceSavingSketch(val capacity: Int) extends Serializable {
  // item -> (count, overestimate error)
  val counters: mutable.LinkedHashMap[String, (Long, Long)] =
    mutable.LinkedHashMap.empty

  def add(item: String, weight: Long = 1L): Unit = {
    counters.get(item) match {
      case Some((c, e)) => counters.update(item, (c + weight, e))
      case None if counters.size < capacity =>
        counters.update(item, (weight, 0L))
      case None =>
        // evict the minimum counter; inherit its count as error bound
        val (minItem, (minC, _)) = counters.minBy(_._2._1)
        counters.remove(minItem)
        counters.update(item, (minC + weight, minC))
    }
  }

  /** Mergeable-summaries combine (Agarwal et al., PODS'12): an item
    * absent from one side may still have occurred up to that side's
    * minimum counter value (that is what eviction guarantees), so the
    * absent side contributes (min, min) to (count, error). A side
    * that never evicted (size < capacity) contributes (0, 0). Keeps
    * est ≥ true ≥ est − err through any merge tree — the property
    * map-side partial aggregation relies on.
    */
  def merge(other: SpaceSavingSketch): Unit = {
    val minSelf =
      if (counters.size >= capacity) counters.values.map(_._1).min else 0L
    val minOther =
      if (other.counters.size >= other.capacity) other.counters.values.map(_._1).min
      else 0L
    val items = counters.keySet ++ other.counters.keySet
    val merged = items.toSeq.map { item =>
      val (cA, eA) = counters.getOrElse(item, (minSelf, minSelf))
      val (cB, eB) = other.counters.getOrElse(item, (minOther, minOther))
      item -> (cA + cB, eA + eB)
    }
    counters.clear()
    merged.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      .foreach { case (i, ce) => counters.update(i, ce) }
  }

  /** top-k by estimated count, deterministic tie-break on the item. */
  def topK(k: Int): Seq[(String, Long, Long)] =
    counters.toSeq.map { case (i, (c, e)) => (i, c, e) }
      .sortBy { case (i, c, _) => (-c, i) }
      .take(k)
}

/** `graft_heavy_hitters(item, capacity, k)` — returns an array of
  * structs (item, est_count, max_err), largest first.
  */
case class HeavyHitters(child: Expression, capacity: Int, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("est_count", LongType),
    StructField("max_err", LongType))))

  override def createAggregationBuffer(): SpaceSavingSketch =
    new SpaceSavingSketch(capacity)

  override def update(buf: SpaceSavingSketch, input: InternalRow): SpaceSavingSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: SpaceSavingSketch, other: SpaceSavingSketch): SpaceSavingSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: SpaceSavingSketch): Any =
    new GenericArrayData(buf.topK(k).map { case (i, c, e) =>
      InternalRow(UTF8String.fromString(i), c, e)
    })

  override def serialize(buf: SpaceSavingSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (i, (c, e)) =>
      out.writeUTF(i); out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSketch = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val sk = new SpaceSavingSketch(in.readInt())
    (0 until in.readInt()).foreach { _ =>
      val i = in.readUTF(); val c = in.readLong(); val e = in.readLong()
      sk.counters.update(i, (c, e))
    }
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
  override def prettyName: String = "graft_heavy_hitters"
}

object HeavyHitters {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
  def heavyHitters(c: Column, capacity: Int, k: Int): Column =
    toCol(HeavyHitters(toExpr(c), capacity, k).toAggregateExpression())
}
