package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderFunctions

/** SURVEY §2.5 — data-layout optimization for scan pruning: Z-order
  * clustering before a write, so parquet footer min/max stats prune
  * files for filters on EITHER clustering column (a 1-D sort prunes
  * only its own column). At 100 TB this is the difference between
  * touching 1/K of the files and touching all of them on the
  * second-dimension predicate.
  *
  * Mechanics: each dimension is min/max-normalized to 16 bits with
  * EXACT integer arithmetic against a broadcast 1-row bounds table
  * (one cheap pre-pass — the same stats a table catalog already
  * holds), Morton-interleaved into a 64-bit key by the codegen'd
  * [[graft.functions.InterleaveBits]], then range-partitioned and
  * sorted by that key. Cost: one extra exchange before the write —
  * identical to what any sorted write pays.
  */
object Layout {

  /** df augmented with a curve key over two 16-bit-normalized
    * dimensions; `key` builds the curve index from the normalized
    * int columns. */
  private def withCurveKey(df: DataFrame, colA: String, colB: String,
                           out: String,
                           key: (Column, Column) => Column): DataFrame = {
    val bounds = df.agg(
      min(col(colA).cast("long")).as("__mna"), max(col(colA).cast("long")).as("__mxa"),
      min(col(colB).cast("long")).as("__mnb"), max(col(colB).cast("long")).as("__mxb"))
    def norm16(c: String, mn: String, mx: String) = {
      // exact integer scaling into 0..65535; degenerate range → 0.
      // Arithmetic is decimal(38,0): (v-mn)*65535 can exceed Long for
      // full-range long columns (e.g. epoch-micros timestamps), and
      // `div` keeps the division integral — no double round-trip.
      val v  = col(c).cast("long").cast("decimal(38,0)")
      val lo = col(mn).cast("decimal(38,0)")
      val hi = col(mx).cast("decimal(38,0)")
      when(col(mx) === col(mn), lit(0))
        .otherwise(call_function("div", (v - lo) * lit(65535), hi - lo))
        .cast("int")
    }
    df.crossJoin(broadcast(bounds))
      .withColumn(out, key(
        norm16(colA, "__mna", "__mxa"), norm16(colB, "__mnb", "__mxb")))
      .drop("__mna", "__mxa", "__mnb", "__mxb")
  }

  /** df augmented with a `__z` Morton key over two long/int columns. */
  def withZKey(df: DataFrame, colA: String, colB: String): DataFrame =
    withCurveKey(df, colA, colB, "__z", ZOrderFunctions.interleaveBits)

  /** df augmented with a `__h` Hilbert key — same normalization, the
    * curve with no quadrant-seam jumps (consecutive indices are
    * ADJACENT cells), so contiguous ranges cover compacter rectangles
    * and per-file intervals come out tighter than Morton's. */
  def withHilbertKey(df: DataFrame, colA: String, colB: String): DataFrame =
    withCurveKey(df, colA, colB, "__h", ZOrderFunctions.hilbertIndex)

  private def curveWrite(keyed: DataFrame, path: String, keyCol: String,
                         nFiles: Int): Unit =
    keyed.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .drop(keyCol)
      .write.mode("overwrite").parquet(path)

  /** Write df Z-ordered on (colA, colB) into `nFiles` parquet files. */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
                  nFiles: Int): Unit =
    curveWrite(withZKey(df, colA, colB), path, "__z", nFiles)

  /** Write df Hilbert-clustered on (colA, colB) into `nFiles` files. */
  def hilbertWrite(df: DataFrame, path: String, colA: String, colB: String,
                   nFiles: Int): Unit =
    curveWrite(withHilbertKey(df, colA, colB), path, "__h", nFiles)

  /** Per-file [min, max] spread of a column, as a fraction of the
    * global range — the file-skipping quality metric: a filter on the
    * column reads only files whose interval covers the predicate, so
    * mean spread ≈ fraction of files a point query touches.
    */
  def fileSpread(spark: SparkSession, path: String, c: String): Double = {
    val df = spark.read.parquet(path)
      .select(col(c).cast("long").as("v"), input_file_name().as("f"))
    val global = df.agg((max(col("v")) - min(col("v"))).cast("double").as("r"))
    val perFile = df.groupBy(col("f"))
      .agg((max(col("v")) - min(col("v"))).cast("double").as("fr"))
    perFile.crossJoin(broadcast(global))
      .agg(avg(col("fr") / col("r"))).head().getDouble(0)
  }
}
