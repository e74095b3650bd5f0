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

object ZOrderFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  def interleaveBits(a: Column, b: Column): Column =
    toCol(InterleaveBits(toExpr(a), toExpr(b)))
}
