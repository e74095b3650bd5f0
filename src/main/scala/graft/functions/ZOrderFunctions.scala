package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) curve support — SURVEY §2.5. Interleaving the
  * bits of two rank-normalized dimensions gives a 1-D sort key whose
  * locality covers BOTH dimensions, so min/max footer stats prune
  * files on either filter column. The standard lakehouse layout trick
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`), implemented here as a
  * codegen'd expression over public APIs.
  */
object ZOrderOps {

  /** Spread the low 32 bits of v so bit i lands at position 2i
    * (the classic Morton "part1by1" mask ladder). */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code of two 32-bit values: a's bits at even
    * positions, b's at odd. */
  def interleave(a: Int, b: Int): Long = spread(a) | (spread(b) << 1)
}

/** Codegen'd 64-bit Morton interleave of two INT dimensions. */
case class InterleaveBits(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_interleave_bits needs (int, int), got (${left.dataType}, ${right.dataType})")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderOps.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderOps.interleave($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_interleave_bits"
}

/** HILBERT curve support — the second space-filling curve next to
  * Morton. Hilbert's defining property: CONSECUTIVE indices are
  * ADJACENT grid cells (Manhattan distance 1, no Morton "jumps"
  * across quadrant seams), so contiguous index ranges cover more
  * compact rectangles and per-file min/max intervals come out tighter
  * on BOTH dimensions — the reason Delta chose Hilbert for its
  * liquid clustering. Transform is the classic public rotate-and-
  * accumulate xy→d (Hilbert 1891; the iterative form popularized by
  * the Wikipedia/Warren spellings), codegen'd like the Morton kernel.
  */
object HilbertOps {

  /** Hilbert index of (x, y) on a 2^bits × 2^bits grid. */
  def xy2d(xIn: Int, yIn: Int, bits: Int): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1 << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s.toLong * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the sub-curve aligns
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** The 16-bit-per-dimension form matching the Morton key's
    * normalization (Layout.norm16). */
  def hilbert16(a: Int, b: Int): Long = xy2d(a, b, 16)
}

/** Codegen'd Hilbert index of two 16-bit-normalized INT dimensions. */
case class HilbertIndex(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert_index needs (int, int), got (${left.dataType}, ${right.dataType})")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertOps.hilbert16(a.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HilbertOps.hilbert16($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_hilbert_index"
}

object ZOrderFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  def interleaveBits(a: Column, b: Column): Column =
    toCol(InterleaveBits(toExpr(a), toExpr(b)))

  def hilbertIndex(a: Column, b: Column): Column =
    toCol(HilbertIndex(toExpr(a), toExpr(b)))
}
