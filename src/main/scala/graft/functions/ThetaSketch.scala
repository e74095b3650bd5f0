package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV / theta sketch (k-minimum-values; Bar-Yossef et al. RANDOM'02,
  * the theta-sketch framework of Dasgupta et al. '16) as a mergeable
  * aggregate + SET-OPERATION estimators — SURVEY.md §2.5. The
  * capability HLL can't give: HLL unions but cannot INTERSECT, and
  * "how many distinct tokens/URLs/users do sources A and B SHARE" is
  * the cross-source overlap question q124 answers exactly with a
  * distinct self-join of the full key space. A KMV sketch reduces
  * each side to the k smallest hash values (k·8 bytes, ONE map-side-
  * combining aggregate, the key space never shuffles); then for any
  * pair, θ = min(θ_A, θ_B) restricts both retained sets to a common
  * uniform sample of the key universe, and
  *   |A∪B| ≈ |S_A∪S_B below θ| / θ,  |A∩B| ≈ |S_A∩S_B below θ| / θ,
  *   J(A,B) ≈ |S_A∩S_B| / |S_A∪S_B|   (both restricted below θ)
  * — each estimate one count + one IEEE division, relative error
  * O(1/√k) (≈6% at k=256). A non-full sketch retains EVERY distinct
  * hash (θ = 1), so small sides are exact by construction.
  *
  * Hash: mix64(fnv1a64(item)) — the avalanched 64-bit kernel the
  * minhash/bloom paths share; values are stored XOR Long.MinValue so
  * signed ordering equals unsigned hash ordering.
  *
  * Serialized layout: int k, int size, size longs ascending (shifted
  * domain). Merge = set-union keep-k-smallest — associative and
  * commutative, so map-side partials combine and per-day sketches
  * roll up to any window without rescanning (the q178 manifest
  * discipline for cardinalities).
  */
final class KmvSketch(val k: Int) extends Serializable {
  // shifted domain: s = hash ^ Long.MinValue, so s1 < s2 (signed)
  // iff unsigned(hash1) < unsigned(hash2)
  val set = new java.util.TreeSet[java.lang.Long]()

  def addItem(item: UTF8String): Unit =
    addShifted(VectorOps.mix64(TextOps.fnv1a64(item)) ^ Long.MinValue)

  def addShifted(s: Long): Unit = {
    if (set.size < k) { set.add(s); () }
    else if (s < set.last) { if (set.add(s)) { set.pollLast(); () } }
  }

  def merge(other: KmvSketch): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) addShifted(it.next())
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * set.size)
    bb.putInt(k)
    bb.putInt(set.size)
    val it = set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
}

object KmvOps {

  private val TWO_POW_64 = 1.8446744073709552e19
  private val MIN_AS_DOUBLE = -9.223372036854776e18

  /** Fraction of the unsigned 64-bit hash space at-or-below this
    * shifted value (the θ of a full sketch whose kth min it is). */
  @inline private def frac(shifted: Long): Double =
    ((shifted.toDouble - MIN_AS_DOUBLE) + 1.0) / TWO_POW_64

  private def kOf(bytes: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(bytes).getInt(0)
  private def sizeOf(bytes: Array[Byte]): Int =
    java.nio.ByteBuffer.wrap(bytes).getInt(4)
  private def valueAt(bytes: Array[Byte], i: Int): Long =
    java.nio.ByteBuffer.wrap(bytes).getLong(8 + 8 * i)

  /** θ in the SHIFTED domain: the kth min if the sketch is full,
    * else +∞ (every distinct hash was retained — the sketch is the
    * exact set). Exclusive upper bound for "below θ" counting. */
  private def thetaShifted(bytes: Array[Byte]): Long = {
    val n = sizeOf(bytes)
    if (n < kOf(bytes)) Long.MaxValue else valueAt(bytes, n - 1)
  }

  def deserialize(bytes: Array[Byte]): KmvSketch = {
    val sk = new KmvSketch(kOf(bytes))
    val n = sizeOf(bytes)
    var i = 0
    while (i < n) { sk.set.add(valueAt(bytes, i)); i += 1 }
    sk
  }

  /** Distinct-count estimate of one sketch: exact size when not
    * full, else (k−1)/θ (the unbiased KMV estimator). */
  def estimate(bytes: Array[Byte]): Double = {
    val n = sizeOf(bytes)
    if (n < kOf(bytes)) n.toDouble
    else (n - 1).toDouble / frac(valueAt(bytes, n - 1))
  }

  /** (|below-θ union|, |below-θ intersection|, θfrac, exact?) for a
    * pair of sketches — the shared kernel of the set-op estimators.
    * Both retained sets are restricted below θ = min(θ_A, θ_B); when
    * BOTH sketches are non-full the counts are exact (θ = 1). */
  private def pairCounts(a: Array[Byte], b: Array[Byte]): (Long, Long, Double) = {
    val thA = thetaShifted(a)
    val thB = thetaShifted(b)
    val th = math.min(thA, thB)
    val thFrac =
      if (th == Long.MaxValue) 1.0 else frac(th)
    // both arrays ascending: one linear merge pass, counting values
    // STRICTLY below θ (θ itself is the kth retained value of the
    // tighter sketch — excluded, matching the (k−1)/θ estimator)
    val na = sizeOf(a)
    val nb = sizeOf(b)
    var i = 0
    var j = 0
    var union = 0L
    var inter = 0L
    while (i < na || j < nb) {
      val va = if (i < na) valueAt(a, i) else Long.MaxValue
      val vb = if (j < nb) valueAt(b, j) else Long.MaxValue
      val v = math.min(va, vb)
      if (v >= th && th != Long.MaxValue) { i = na; j = nb }
      else {
        union += 1
        if (va == vb) { inter += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
    }
    (union, inter, thFrac)
  }

  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    // u counts strictly below θ, so u/θ is the (k−1)/θ single-sketch
    // estimator generalized (for one full sketch alone, u = k−1)
    val (u, _, th) = pairCounts(a, b)
    u.toDouble / th
  }

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val (_, i, th) = pairCounts(a, b)
    i.toDouble / th
  }

  def jaccardEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val (u, i, _) = pairCounts(a, b)
    if (u == 0L) 0.0 else i.toDouble / u.toDouble
  }
}

/** `graft_kmv_agg(item, k)` → BINARY sketch bytes (≤ 8 + 8k). */
case class KmvAggregate(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch] {

  require(k >= 8, s"kmv k must be >= 8, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_agg item must be STRING, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KmvSketch = new KmvSketch(k)

  override def update(buf: KmvSketch, input: InternalRow): KmvSketch = {
    val v = child.eval(input)
    if (v != null) buf.addItem(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: KmvSketch, other: KmvSketch): KmvSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvSketch): Any = buf.serialize()
  override def serialize(buf: KmvSketch): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KmvSketch =
    KmvOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
  override def prettyName: String = "graft_kmv_agg"
}

/** `graft_kmv_estimate(sketch)` — distinct-count estimate. */
case class KmvEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(bytes: Any): Any =
    KmvOps.estimate(bytes.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.KmvOps.estimate($b)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_kmv_estimate"
}

/** Binary set-operation estimators over two serialized sketches.
  * These run on dimension-bounded pair frames (one row per source
  * pair), never the corpus. */
abstract class KmvPairExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def opName: String
  protected def opFn(a: Array[Byte], b: Array[Byte]): Double
  override def nullSafeEval(a: Any, b: Any): Any =
    opFn(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.KmvOps.$opName($a, $b)")
  override def prettyName: String = s"graft_kmv_$opName"
}

case class KmvUnionEstimate(left: Expression, right: Expression)
    extends KmvPairExpression {
  override protected def opName: String = "unionEstimate"
  override protected def opFn(a: Array[Byte], b: Array[Byte]): Double =
    KmvOps.unionEstimate(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class KmvIntersectEstimate(left: Expression, right: Expression)
    extends KmvPairExpression {
  override protected def opName: String = "intersectEstimate"
  override protected def opFn(a: Array[Byte], b: Array[Byte]): Double =
    KmvOps.intersectEstimate(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class KmvJaccardEstimate(left: Expression, right: Expression)
    extends KmvPairExpression {
  override protected def opName: String = "jaccardEstimate"
  override protected def opFn(a: Array[Byte], b: Array[Byte]): Double =
    KmvOps.jaccardEstimate(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object KmvFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  def kmvAgg(item: Column, k: Int): Column =
    toCol(KmvAggregate(toExpr(item), k).toAggregateExpression())

  def kmvEstimate(sketch: Column): Column =
    toCol(KmvEstimate(toExpr(sketch)))

  def kmvUnion(a: Column, b: Column): Column =
    toCol(KmvUnionEstimate(toExpr(a), toExpr(b)))

  def kmvIntersect(a: Column, b: Column): Column =
    toCol(KmvIntersectEstimate(toExpr(a), toExpr(b)))

  def kmvJaccard(a: Column, b: Column): Column =
    toCol(KmvJaccardEstimate(toExpr(a), toExpr(b)))
}
