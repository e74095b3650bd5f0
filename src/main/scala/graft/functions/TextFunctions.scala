package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text kernels + SimHash expression — SURVEY.md §2.3/§2.5. */
object TextOps {

  /** FNV-1a 64-bit over UTF-8 bytes — stable, public, allocation-free. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over a token array (Charikar): per-bit vote of
    * each token's FNV hash; bit set iff vote > 0. Near-identical token
    * multisets yield signatures at small hamming distance.
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = fnv1a64(tokens.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** Codegen'd 64-bit SimHash of ArrayType(StringType) tokens. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any): Any =
    TextOps.simhash64(t.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextOps.simhash64($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "graft_simhash64"
}

/** Column-level API + SQL registration for the graft functions. */
object GraftFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}

  def cosine(a: Column, b: Column): Column =
    toCol(CosineSimilarity(toExpr(a), toExpr(b)))

  def hyperplaneSig(v: Column, nBits: Column, seed: Long): Column =
    toCol(HyperplaneSignature(toExpr(v), toExpr(nBits), seed))

  def simhash64(tokens: Column): Column =
    toCol(SimHash64(toExpr(tokens)))

  /** Lower-case, strip non-alphanumerics (keeping spaces), split on
    * single spaces, drop empties — the shared normalization used by
    * dedup/text queries; mirrored verbatim in the DuckDB oracles. */
  def normWords(text: Column): Column =
    filter(split(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " "), w => w =!= "")

  /** w-length word shingles over the normalized words.
    *
    * IMPORTANT: pass a *bound column* (e.g. project normWords into a
    * column first), not an inline expression — `words` is referenced
    * from inside a higher-order lambda where Catalyst disables
    * subexpression elimination, so an inline subtree would be
    * re-evaluated once per shingle index.
    */
  def wordShingles(words: Column, w: Int): Column =
    when(size(words) >= w,
      transform(sequence(lit(1), size(words) - (w - 1)),
        i => array_join(slice(words, i, lit(w)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Register SQL-callable versions (SURVEY §2.5 #48). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64",
      es => SimHash64(es.head), "built-in")
  }
}
