package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom filter as a mergeable aggregate + membership expression —
  * SURVEY.md §2.5. The decontamination / blocklist primitive at
  * 100 TB: build the filter over the SMALL side (benchmark shingles,
  * banned URLs) with `graft_bloom_agg`, broadcast the resulting bytes
  * (m/8 per filter, vs. the full set for an exact broadcast join),
  * and probe with `graft_bloom_contains` in a narrow codegen'd pass
  * over the corpus — no shuffle of corpus data, no join at all.
  * False positives are bounded (~(1−e^{−kn/m})^k); false negatives
  * are impossible, which is the direction that matters for
  * decontamination (never miss a leaked benchmark doc).
  *
  * Hashing: FNV-1a base hash + splitmix64 remix, double-hashing
  * h_i = h1 + i·h2 (Kirsch–Mitzenmacher) — same public kernels the
  * minhash/simhash paths use.
  */
object BloomOps {

  def indexes(item: UTF8String, numBits: Int, numHashes: Int): Array[Int] = {
    val h1 = TextOps.fnv1a64(item)
    val h2 = VectorOps.mix64(h1) | 1L // odd ⇒ full cycle mod powers of two
    val out = new Array[Int](numHashes)
    var i = 0
    while (i < numHashes) {
      val h = h1 + i.toLong * h2
      out(i) = (((h % numBits) + numBits) % numBits).toInt
      i += 1
    }
    out
  }

  /** Round 17: count of array items contained — the per-doc probe of
    * contaminationBloom used to run `filter(shs, sh -> contains)`
    * through a higher-order lambda, which re-materializes the filter
    * BYTES (numBits/8, e.g. 16 KB) once per ELEMENT; this kernel reads
    * the bytes once per ROW and loops the items inside. Identical
    * count (same mightContain per element; null items don't occur in
    * the shingle arrays, and are counted as not-contained). */
  def countContained(bits: Array[Byte], items: org.apache.spark.sql.catalyst.util.ArrayData,
                     numHashes: Int): Long = {
    var c = 0L
    val n = items.numElements()
    var i = 0
    while (i < n) {
      if (!items.isNullAt(i) &&
        mightContain(bits, items.getUTF8String(i), numHashes)) c += 1L
      i += 1
    }
    c
  }

  def mightContain(bits: Array[Byte], item: UTF8String, numHashes: Int): Boolean = {
    val numBits = bits.length * 8
    if (numBits == 0) return false
    val idx = indexes(item, numBits, numHashes)
    var i = 0
    while (i < idx.length) {
      val b = idx(i)
      if ((bits(b >>> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** Mutable bit-set aggregation buffer. */
final class BloomSketch(val numBits: Int, val numHashes: Int) extends Serializable {
  val bits: Array[Byte] = new Array[Byte]((numBits + 7) / 8)

  def add(item: UTF8String): Unit = {
    val idx = BloomOps.indexes(item, numBits, numHashes)
    var i = 0
    while (i < idx.length) {
      val b = idx(i)
      bits(b >>> 3) = (bits(b >>> 3) | (1 << (b & 7))).toByte
      i += 1
    }
  }

  def merge(other: BloomSketch): Unit = {
    var i = 0
    while (i < bits.length) { bits(i) = (bits(i) | other.bits(i)).toByte; i += 1 }
  }
}

/** `graft_bloom_agg(item, numBits, numHashes)` → BINARY filter bytes.
  * Map-side partial sketches OR together associatively, so the filter
  * build is one combine-friendly aggregation pass over the small side.
  */
case class BloomAggregate(child: Expression, numBits: Int, numHashes: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomSketch] {

  require(numBits % 8 == 0 && numBits > 0, s"numBits must be a positive multiple of 8, got $numBits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomSketch =
    new BloomSketch(numBits, numHashes)

  override def update(buf: BloomSketch, input: InternalRow): BloomSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: BloomSketch, other: BloomSketch): BloomSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: BloomSketch): Any = buf.bits.clone()

  override def serialize(buf: BloomSketch): Array[Byte] = buf.bits

  override def deserialize(bytes: Array[Byte]): BloomSketch = {
    val sk = new BloomSketch(numBits, numHashes)
    System.arraycopy(bytes, 0, sk.bits, 0, bytes.length)
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
  override def prettyName: String = "graft_bloom_agg"
}

/** `graft_bloom_contains(filterBytes, item, numHashes)` — codegen'd
  * probe; stays inside whole-stage codegen on the corpus scan.
  */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(bits: Any, item: Any): Any =
    BloomOps.mightContain(bits.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, s) =>
      s"graft.functions.BloomOps.mightContain($b, $s, $numHashes)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_bloom_contains"
}

/** `graft_bloom_count_contained(filterBytes, items, numHashes)` —
  * fused per-row array probe (see [[BloomOps.countContained]]). */
case class BloomCountContained(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(bits: Any, items: Any): Any =
    BloomOps.countContained(bits.asInstanceOf[Array[Byte]],
      items.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, a) =>
      s"graft.functions.BloomOps.countContained($b, $a, $numHashes)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_bloom_count_contained"
}

object BloomFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  def bloomAgg(item: Column, numBits: Int, numHashes: Int): Column =
    toCol(BloomAggregate(toExpr(item), numBits, numHashes).toAggregateExpression())

  def bloomContains(filter: Column, item: Column, numHashes: Int): Column =
    toCol(BloomMightContain(toExpr(filter), toExpr(item), numHashes))

  def bloomCountContained(filter: Column, items: Column, numHashes: Int): Column =
    toCol(BloomCountContained(toExpr(filter), toExpr(items), numHashes))
}
