package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode–Muthukrishnan, J. Algorithms '05) as a
  * mergeable aggregate + a codegen'd point-query expression —
  * SURVEY.md §2.5. The frequency-estimation primitive at 100 TB:
  * Space-Saving (q56) answers "what are the heavy keys"; CMS answers
  * "how often does THIS key occur" for any key, from depth×width
  * counters of fixed size. Per item, one counter per row increments
  * (h_i = h1 + i·h2, the Kirsch–Mitzenmacher double hashing the
  * Bloom filter already uses); the estimate is the min over rows.
  * Guarantees: est ≥ true always (one-sided error — the direction
  * that matters for over-represented-content triage), and
  * est ≤ true + (e/width)·N with probability 1 − e^{−depth}.
  *
  * Merge is cell-wise ADD — exactly additive, so map-side partial
  * sketches combine associatively and a per-day sketch ledger
  * rolls up to any window without rescanning data (the q178
  * manifest discipline for frequencies). Deliberately NOT the
  * conservative-update variant: conservative update lowers
  * single-sketch error but breaks additive mergeability, and
  * mergeability is the property the 100 TB shape is built on.
  */
final class CmsSketch(val depth: Int, val width: Int) extends Serializable {
  val counts: Array[Long] = new Array[Long](depth * width)
  var total: Long = 0L

  // h1/h2 are hoisted out of the per-row loop: hashing the item once
  // per add/estimate (not once per depth row) matches the serialized
  // probe path in CmsOps.estimate.
  @inline private def cellFromHashes(h1: Long, h2: Long, row: Int): Int = {
    val h = h1 + row.toLong * h2
    row * width + (((h % width) + width) % width).toInt
  }

  def add(item: UTF8String, inc: Long): Unit = {
    val h1 = TextOps.fnv1a64(item)
    val h2 = VectorOps.mix64(h1) | 1L
    var r = 0
    while (r < depth) { counts(cellFromHashes(h1, h2, r)) += inc; r += 1 }
    total += inc
  }

  def estimate(item: UTF8String): Long = {
    val h1 = TextOps.fnv1a64(item)
    val h2 = VectorOps.mix64(h1) | 1L
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(cellFromHashes(h1, h2, r))
      if (c < est) est = c
      r += 1
    }
    est
  }

  def merge(other: CmsSketch): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
    total += other.total
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * (counts.length + 1))
    bb.putLong(total)
    counts.foreach(bb.putLong)
    bb.array()
  }
}

object CmsOps {

  @inline private def cellAt(bytes: Array[Byte], idx: Int): Long = {
    val off = 8 * (idx + 1) // layout: 8-byte total, then row-major cells
    var c = 0L
    var b = 0
    while (b < 8) { c = (c << 8) | (bytes(off + b) & 0xffL); b += 1 }
    c
  }

  /** JOIN-SIZE estimate from two serialized sketches (Cormode–
    * Muthukrishnan §4.2): |A ⋈ B| = Σ_k a_k·b_k, estimated as
    * min over rows of Σ_col cmsA[r][c]·cmsB[r][c]. One-sided like the
    * point query (est ≥ true ALWAYS; ≤ true + (e/width)·Na·Nb w.h.p.)
    * — the sketches must share (depth, width, hash family), which
    * every CmsAggregate with equal dims does by construction. */
  def innerProduct(a: Array[Byte], b: Array[Byte], depth: Int,
                   width: Int): Long = {
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      var s = 0L
      var c = 0
      while (c < width) {
        val idx = r * width + c
        s += cellAt(a, idx) * cellAt(b, idx)
        c += 1
      }
      if (s < est) est = s
      r += 1
    }
    est
  }

  def deserialize(bytes: Array[Byte], depth: Int, width: Int): CmsSketch = {
    val sk = new CmsSketch(depth, width)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    sk.total = bb.getLong
    var i = 0
    while (i < sk.counts.length) { sk.counts(i) = bb.getLong; i += 1 }
    sk
  }

  /** Point query against serialized sketch bytes — the probe side
    * broadcasts the bytes and stays inside whole-stage codegen. */
  def estimate(bytes: Array[Byte], item: UTF8String, depth: Int,
               width: Int): Long = {
    var est = Long.MaxValue
    val h1 = TextOps.fnv1a64(item)
    val h2 = VectorOps.mix64(h1) | 1L
    var r = 0
    while (r < depth) {
      val h = h1 + r.toLong * h2
      val idx = r * width + (((h % width) + width) % width).toInt
      // layout: 8-byte total, then row-major cells
      val off = 8 * (idx + 1)
      var c = 0L
      var b = 0
      while (b < 8) { c = (c << 8) | (bytes(off + b) & 0xffL); b += 1 }
      if (c < est) est = c
      r += 1
    }
    est
  }
}

/** `graft_cms_agg(item, weight)` → BINARY sketch bytes (8·(d·w+1)). */
case class CmsAggregate(child: Expression, weight: Expression,
                        depth: Int, width: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsSketch] {

  require(depth > 0 && width > 0, s"bad CMS dims $depth x $width")

  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // Analysis-time contract: item is STRING, weight any integral type
  // (a caller's lit(1) arrives as INT — widen, don't ClassCastException
  // inside the hot update loop).
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cms_agg item must be STRING, got ${child.dataType.catalogString}")
    else weight.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_agg weight must be an integral type, got ${dt.catalogString}")
    }
  }

  @transient private lazy val weightAsLong: Any => Long =
    weight.dataType match {
      case LongType    => w => w.asInstanceOf[Long]
      case IntegerType => w => w.asInstanceOf[Int].toLong
      case ShortType   => w => w.asInstanceOf[Short].toLong
      case _           => w => w.asInstanceOf[Byte].toLong
    }

  override def createAggregationBuffer(): CmsSketch =
    new CmsSketch(depth, width)

  override def update(buf: CmsSketch, input: InternalRow): CmsSketch = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight.eval(input)
      if (w != null) buf.add(v.asInstanceOf[UTF8String], weightAsLong(w))
    }
    buf
  }

  override def merge(buf: CmsSketch, other: CmsSketch): CmsSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: CmsSketch): Any = buf.serialize()
  override def serialize(buf: CmsSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): CmsSketch =
    CmsOps.deserialize(bytes, depth, width)

  override def withNewMutableAggBufferOffset(o: Int): CmsAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head, weight = cs(1))
  override def prettyName: String = "graft_cms_agg"
}

/** `graft_cms_estimate(sketchBytes, item)` — codegen'd min-over-rows
  * point query. */
case class CmsEstimate(left: Expression, right: Expression,
                       depth: Int, width: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(bytes: Any, item: Any): Any =
    CmsOps.estimate(bytes.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String], depth, width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, s) =>
      s"graft.functions.CmsOps.estimate($b, $s, $depth, $width)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_cms_estimate"
}

/** `graft_cms_inner(sketchA, sketchB)` — codegen'd join-size estimate
  * Σ_k a_k·b_k from two same-dims serialized sketches. */
case class CmsInnerProduct(left: Expression, right: Expression,
                           depth: Int, width: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    CmsOps.innerProduct(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], depth, width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CmsOps.innerProduct($a, $b, $depth, $width)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_cms_inner"
}

object CmsFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  def cmsAgg(item: Column, weight: Column, depth: Int, width: Int): Column =
    toCol(CmsAggregate(toExpr(item), toExpr(weight), depth, width)
      .toAggregateExpression())

  def cmsEstimate(sketch: Column, item: Column, depth: Int, width: Int): Column =
    toCol(CmsEstimate(toExpr(sketch), toExpr(item), depth, width))

  def cmsInnerProduct(a: Column, b: Column, depth: Int, width: Int): Column =
    toCol(CmsInnerProduct(toExpr(a), toExpr(b), depth, width))
}
