package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Approximate-string-matching kernels for the record-linkage family
  * (SURVEY §2.1 24f blocked fuzzy match, §2.3 40du Fellegi–Sunter):
  * Jaro–Winkler similarity (Winkler '90 — the census-bureau matcher,
  * and the comparator DuckDB ships as `jaro_winkler_similarity`, which
  * is what lets the queries using this kernel oracle-check exactly)
  * and American Soundex (Russell 1918 — the classic phonetic blocking
  * key). Both are narrow per-row kernels: codegen'd, zero shuffles,
  * no UDF boxing in the hot loop.
  */
object StringOps {

  /** Textbook Jaro similarity with the standard Winkler prefix boost
    * (p = 0.1, prefix capped at 4, applied only when jaro > 0.7) —
    * matches DuckDB's `jaro_winkler_similarity` (verified on the
    * boost-threshold, transposition and short-string edge cases).
    * Empty strings score 0.0, including empty-vs-empty (the DuckDB
    * convention). Comparison is over raw UTF-8 BYTES, not UTF-16 code
    * units — DuckDB's jaro_winkler_similarity scores the byte strings
    * (verified: 'münchen'/'munchen' → (6/8+6/7+1)/3 boosted = 0.88214…,
    * i.e. lengths 8 and 7, and CJK/emoji fixtures all reproduce), so
    * byte-level comparison is what keeps non-ASCII parity with the
    * oracle exact. It is also the faster path: UTF8String holds UTF-8
    * bytes natively, so the kernel runs with zero String decode. The
    * kernel spec pins multi-byte and astral (surrogate-pair) cases.
    */
  def jaroWinkler(au: UTF8String, bu: UTF8String): Double = {
    val s = au.getBytes
    val t = bu.getBytes
    val ls = s.length; val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sM = new Array[Boolean](ls)
    val tM = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val lo = math.max(0, i - window)
      val hi = math.min(lt - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tM(j) && s(i) == t(j)) {
          sM(i) = true; tM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: mismatched positions between the two matched
    // subsequences, halved with FLOOR — the DuckDB/rapidfuzz
    // convention (t = mismatches / 2 in integer arithmetic; verified
    // exact against jaro_winkler_similarity on 18k customer pairs +
    // 4k random fuzz strings)
    var k = 0; var mismatch = 0
    i = 0
    while (i < ls) {
      if (sM(i)) {
        while (!tM(k)) k += 1
        if (s(i) != t(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val trans = mismatch / 2
    val md = m.toDouble
    val jaro = (md / ls + md / lt + (md - trans) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val maxP = math.min(4, math.min(ls, lt))
      while (p < maxP && s(p) == t(p)) p += 1
      jaro + 0.1 * p * (1.0 - jaro)
    } else jaro
  }

  /** a..z → soundex digit codes; 0 = vowel separator (a e i o u y),
    * 7 = transparent (h w). */
  private val codes = "01230127022455012623017202"

  /** American Soundex with the h/w-transparency rule, as a fully
    * regular pipeline so the DuckDB oracle can mirror it verbatim
    * with translate + regexp_replace:
    *
    *   base  = lower(keep a–z only);            '' → ''
    *   t1    = per-char digit codes (h/w → 7)
    *   t2    = drop 7s (duplicates across h/w collapse)
    *   t3    = collapse adjacent duplicate digits
    *   t4    = drop the leading code UNLESS the first letter was h/w
    *           (its code vanished with the 7s already)
    *   t5    = drop 0s (vowels only separate)
    *   code  = UPPER(first letter) + first 3 of (t5 + "000")
    */
  def soundex(nameU: UTF8String): UTF8String = {
    val raw = nameU.toString
    val base = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c >= 'a' && c <= 'z') base.append(c)
      else if (c >= 'A' && c <= 'Z') base.append((c + 32).toChar)
      i += 1
    }
    if (base.length == 0) return UTF8String.fromString("")
    val first = base.charAt(0)
    val digits = new java.lang.StringBuilder(base.length)
    i = 0
    while (i < base.length) {
      val code = codes.charAt(base.charAt(i) - 'a')
      if (code != '7') { // t2: h/w transparent
        if (digits.length == 0 || digits.charAt(digits.length - 1) != code)
          digits.append(code) // t3: collapse adjacent runs
      }
      i += 1
    }
    // t4: drop the first letter's own (collapsed) code
    val startAt = if (first == 'h' || first == 'w') 0 else 1
    val out = new java.lang.StringBuilder(4)
    out.append((first - 32).toChar)
    i = startAt
    while (i < digits.length && out.length < 4) {
      if (digits.charAt(i) != '0') out.append(digits.charAt(i)) // t5
      i += 1
    }
    while (out.length < 4) out.append('0')
    UTF8String.fromString(out.toString)
  }
}

/** Codegen'd Jaro–Winkler similarity of two strings. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), " +
        s"got (${left.dataType}, ${right.dataType})")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    StringOps.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringOps.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "graft_jaro_winkler"
}

/** Codegen'd American Soundex phonetic code of a string. */
case class SoundexCode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")
  }
  override def nullSafeEval(t: Any): Any =
    StringOps.soundex(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.StringOps.soundex($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_soundex"
}
