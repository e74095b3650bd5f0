package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file; at 100 TB these would be
  * partitioned parquet directories — `spark.read.parquet` handles both
  * transparently, and every downstream operator relies on Catalyst
  * column pruning + predicate pushdown into this scan.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** The wild produces (at least) three parquet timestamp flavors for
    * events.ts, and the driver's generator has shipped two of them
    * across rounds:
    *
    *   - TIMESTAMP(NANOS): Spark reads it as a raw long under
    *     spark.sql.legacy.parquet.nanosAsLong=true (set in Verify/
    *     Bench/tests) → truncate to micros, same as DuckDB does;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *     TIMESTAMP_NTZ → reinterpret as session-tz TIMESTAMP (session
    *     tz is pinned to UTC everywhere, and the data is synthetic
    *     UTC, so the cast is value-preserving);
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=true): already the
    *     TimestampType every downstream unix_micros/window/watermark
    *     call site expects → pass through.
    *
    * ONE normalizer, applied by both the batch loader and the
    * streaming source, so every downstream operator sees TimestampType
    * micros regardless of generator drift. (Round-8 fix: the r7
    * testdata switched nanos→NTZ-micros and broke 9 queries.)
    */
  def normalizeEventTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case LongType =>
        df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      case TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      case _ => df
    }

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventTs(t(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
