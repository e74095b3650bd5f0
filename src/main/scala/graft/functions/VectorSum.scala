package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector sum with EXACT decimal accumulation — the
  * gradient/moment reduction of distributed training (q166) without
  * a dim-explode + groupBy per pass: state is one d-length
  * BigDecimal array per partition (d-bounded, independent of row
  * count), each input element quantized to `scale` decimal places
  * before adding, so the reduction is associative and bit-identical
  * under ANY partitioning or merge order — the q74/q101 decimal
  * discipline lifted from scalars to vectors. Versus the explode
  * spelling: no d× row blow-up, no shuffle of per-dim rows — just
  * map-side partials and one d-length merge row.
  */
final class DecimalVectorBuffer(val dim: Int) extends Serializable {
  val sums: Array[JBigDecimal] = Array.fill(dim)(JBigDecimal.ZERO)
  var count: Long = 0L

  def add(values: ArrayData, scale: Int): Unit = {
    var i = 0
    while (i < dim) {
      if (!values.isNullAt(i)) {
        // valueOf (shortest decimal repr, ≤ 17 sig digits) beats the
        // exact-binary-expansion constructor ~5× here; both are
        // deterministic quantizations of the same double, and the
        // associativity/invariance property depends only on the
        // quantize-BEFORE-add order, which is unchanged.
        // CONTRACT: the quantization is of the SHORTEST-DECIMAL repr,
        // which drifts from the exact binary expansion once |x|
        // exceeds ~17 significant digits relative to `scale` (at
        // scale 12, |x| ≳ 1e5 can differ in the last retained digit).
        // Callers feed gradients/moments/scores with |x| ≪ 1e5; a
        // caller summing large-magnitude elements must lower `scale`
        // or accept shortest-repr rounding semantics.
        val q = JBigDecimal.valueOf(values.getDouble(i))
          .setScale(scale, java.math.RoundingMode.HALF_UP)
        sums(i) = sums(i).add(q)
      }
      i += 1
    }
    count += 1
  }

  def merge(other: DecimalVectorBuffer): Unit = {
    var i = 0
    while (i < dim) {
      sums(i) = sums(i).add(other.sums(i))
      i += 1
    }
    count += other.count
  }
}

/** `graft_vector_sum(arr, dim, scale)` — returns struct(n long,
  * sums array<double>): the exact decimal element-wise sum rendered
  * back to doubles (one conversion AFTER the exact reduction).
  */
case class DecimalVectorSum(child: Expression, dim: Int, scale: Int = 12,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DecimalVectorBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType),
    StructField("sums", ArrayType(DoubleType))))

  override def createAggregationBuffer(): DecimalVectorBuffer =
    new DecimalVectorBuffer(dim)

  override def update(buf: DecimalVectorBuffer, input: InternalRow): DecimalVectorBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], scale)
    buf
  }

  override def merge(buf: DecimalVectorBuffer, other: DecimalVectorBuffer): DecimalVectorBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: DecimalVectorBuffer): Any =
    InternalRow(buf.count,
      new GenericArrayData(buf.sums.map(_.doubleValue())))

  override def serialize(buf: DecimalVectorBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.dim)
    out.writeLong(buf.count)
    buf.sums.foreach { s =>
      val str = s.toPlainString
      out.writeUTF(str)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DecimalVectorBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new DecimalVectorBuffer(in.readInt())
    buf.count = in.readLong()
    (0 until buf.dim).foreach { i =>
      buf.sums(i) = new JBigDecimal(in.readUTF())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): DecimalVectorSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DecimalVectorSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
  override def prettyName: String = "graft_vector_sum"
}

object DecimalVectorSum {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
  def vectorSum(c: Column, dim: Int, scale: Int = 12): Column =
    toCol(DecimalVectorSum(toExpr(c), dim, scale).toAggregateExpression())
}
