package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern automaton — the scale shape for
  * dictionary tagging (blocklists, PII term lists, topic lexicons).
  * A regex alternation over K terms costs O(len·K) per document
  * (q69/q207's shape is fine for a handful of patterns); the AC
  * automaton costs O(len) regardless of K, so a 10k-term blocklist
  * scans 100 TB at the same price as a single `contains`.
  *
  * The automaton is built ONCE on the driver from the (bounded) term
  * list and rides into every task inside the serialized expression —
  * a reference object in generated code, the CountMatches discipline.
  * Matching is byte-level over the raw UTF8String (terms must be
  * ASCII-lowercase; callers lower() the scan column), goto links in
  * one shared int-keyed open hash (key = state<<8 | byte) so memory
  * is O(total term bytes), not O(states × 256).
  *
  * Counting semantics (mirrored by the DuckDB oracles): every
  * occurrence of every term counts, including matches inside longer
  * words ("win" fires inside "window") and terms nested in other
  * terms — each term is counted independently. Terms must be
  * BORDERLESS (no proper prefix that is also a suffix): for such
  * terms self-overlapping occurrences are impossible, so the count
  * equals DuckDB's non-overlapping replace()-count and the oracle
  * stays exact.
  */
final class AcAutomaton(termsIn: Seq[String]) extends Serializable {
  val terms: Array[String] = termsIn.toArray
  require(terms.nonEmpty, "empty term list")
  terms.foreach { t =>
    require(t.nonEmpty && t.forall(c => c < 128 && !c.isUpper),
      s"AC terms must be non-empty ASCII lowercase: '$t'")
    val border = (1 until t.length).exists(k =>
      t.regionMatches(0, t, t.length - k, k))
    require(!border,
      s"AC term '$t' has a border (prefix==suffix) — self-overlapping " +
        "matches would break oracle count parity")
  }

  // --- trie build (driver-side, bounded by total term bytes) ---
  private val termBytes = terms.map(_.getBytes("UTF-8"))
  val nStates: Int = {
    // upper bound: 1 + total bytes; exact count found during insert
    var next = 1
    val tmp = new java.util.HashMap[Long, Integer]()
    termBytes.foreach { tb =>
      var s = 0
      var i = 0
      while (i < tb.length) {
        val key = (s.toLong << 8) | (tb(i) & 0xffL)
        val e = tmp.get(key)
        if (e == null) { tmp.put(key, next); s = next; next += 1 }
        else s = e.intValue()
        i += 1
      }
    }
    next
  }
  // goto map: (state<<8 | byte) -> state. Open-addressed long->int
  // table sized 2x entries, linear probing; EMPTY = -1.
  private val cap = Integer.highestOneBit(math.max(16, nStates * 4) - 1) << 1
  private val keysArr = Array.fill[Long](cap)(-1L)
  private val valsArr = new Array[Int](cap)
  private def put(key: Long, v: Int): Unit = {
    var i = (scala.util.hashing.byteswap64(key) & (cap - 1)).toInt
    while (keysArr(i) != -1L && keysArr(i) != key) i = (i + 1) & (cap - 1)
    keysArr(i) = key; valsArr(i) = v
  }
  private[functions] def get(key: Long): Int = {
    var i = (scala.util.hashing.byteswap64(key) & (cap - 1)).toInt
    while (keysArr(i) != -1L) {
      if (keysArr(i) == key) return valsArr(i)
      i = (i + 1) & (cap - 1)
    }
    -1
  }
  val fail: Array[Int] = new Array[Int](nStates)
  /** term index ending at state, else -1 (terms are distinct; nested
    * terms surface via outLink chains). */
  val termAt: Array[Int] = Array.fill(nStates)(-1)
  /** next state (following fail links) with a term output, else -1 —
    * the standard output-link compression so matching pays O(1) when
    * nothing matches. */
  val outLink: Array[Int] = Array.fill(nStates)(-1)
  val termLen: Array[Int] = termBytes.map(_.length)

  {
    // rebuild goto into the open table + record term ends
    val tmp = new java.util.HashMap[Long, Integer]()
    var next = 1
    termBytes.zipWithIndex.foreach { case (tb, ti) =>
      var s = 0
      var i = 0
      while (i < tb.length) {
        val key = (s.toLong << 8) | (tb(i) & 0xffL)
        val e = tmp.get(key)
        if (e == null) { tmp.put(key, next); put(key, next); s = next; next += 1 }
        else s = e.intValue()
        i += 1
      }
      require(termAt(s) == -1, s"duplicate AC term '${terms(ti)}'")
      termAt(s) = ti
    }
    // BFS failure links
    val queue = new java.util.ArrayDeque[Integer]()
    val it = tmp.entrySet().iterator()
    // children of root enqueue with fail=root
    while (it.hasNext) {
      val e = it.next()
      if ((e.getKey >>> 8) == 0L) { fail(e.getValue) = 0; queue.add(e.getValue) }
    }
    // need child listing per state for BFS: bucket the goto entries
    val children = Array.fill(nStates)(List.empty[(Int, Int)]) // (byte, child)
    val it2 = tmp.entrySet().iterator()
    while (it2.hasNext) {
      val e = it2.next()
      val s = (e.getKey >>> 8).toInt
      val b = (e.getKey & 0xff).toInt
      children(s) = (b, e.getValue.intValue()) :: children(s)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      outLink(u) =
        if (termAt(fail(u)) >= 0) fail(u)
        else outLink(fail(u))
      children(u).foreach { case (b, v) =>
        var f = fail(u)
        var g = get((f.toLong << 8) | b)
        while (g == -1 && f != 0) { f = fail(f); g = get((f.toLong << 8) | b) }
        fail(v) = if (g == -1) 0 else g
        queue.add(v)
      }
    }
  }

  /** One O(len) pass; fills counts[ti] and firstStart[ti] (byte
    * offset, -1 if unseen). Returns total hits. */
  def scanInto(bytes: Array[Byte], len: Int, counts: Array[Long],
               firstStart: Array[Int]): Long = {
    var total = 0L
    var s = 0
    var i = 0
    while (i < len) {
      val b = bytes(i) & 0xff
      var g = get((s.toLong << 8) | b)
      while (g == -1 && s != 0) { s = fail(s); g = get((s.toLong << 8) | b) }
      s = if (g == -1) 0 else g
      var o = if (termAt(s) >= 0) s else outLink(s)
      while (o != -1) {
        val ti = termAt(o)
        counts(ti) += 1
        total += 1
        val start = i - termLen(ti) + 1
        if (firstStart(ti) == -1 || start < firstStart(ti)) firstStart(ti) = start
        o = outLink(o)
      }
      i += 1
    }
    total
  }
}

object AcOps {
  /** Kernel behind [[AcScan]]: returns (n_hits, n_terms, first_term)
    * where first_term is the term whose earliest occurrence STARTS
    * first (ties: lexicographically smaller term — both mirrored by
    * the strpos-argmin oracle), null when nothing matched.
    */
  def scan(ac: AcAutomaton, s: UTF8String): InternalRow = {
    val k = ac.terms.length
    val counts = new Array[Long](k)
    val firstStart = Array.fill(k)(-1)
    val bytes = s.getBytes
    val total = ac.scanInto(bytes, bytes.length, counts, firstStart)
    var nTerms = 0
    var bestTi = -1
    var ti = 0
    while (ti < k) {
      if (counts(ti) > 0) {
        nTerms += 1
        if (bestTi == -1 || firstStart(ti) < firstStart(bestTi) ||
          (firstStart(ti) == firstStart(bestTi) &&
            ac.terms(ti) < ac.terms(bestTi))) bestTi = ti
      }
      ti += 1
    }
    val first = if (bestTi == -1) null else UTF8String.fromString(ac.terms(bestTi))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, nTerms, first))
  }
}

/** struct(n_hits BIGINT, n_terms INT, first_term STRING) per input
  * string — one codegen'd automaton pass fused into the scan.
  */
case class AcScan(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_terms", IntegerType, nullable = false),
    StructField("first_term", StringType, nullable = true)))
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType}")
  @transient private lazy val ac = new AcAutomaton(terms)
  override def nullSafeEval(s: Any): Any =
    AcOps.scan(ac, s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAcAutomaton", ac,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.AcOps.scan($ref, $s);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "graft_ac_scan"
}
