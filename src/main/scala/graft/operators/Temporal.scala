package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 — temporal / event operators (batch semantics;
  * streaming equivalents in graft.streaming.EventStream).
  */
object Temporal {

  /** As-of join: for each left row, the single latest right row with
    * rightTime ≤ leftTime on the same key. Declarative formulation:
    * equi-join on the key (shuffle on key, AQE-skew-aware), time
    * filter, then a one-row-per-left window. At 100 TB the join key
    * (user/entity) distributes the work; the fan-out is bounded by
    * per-key history length.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               leftId: String, tieBreak: String): DataFrame = {
    val joined = left.join(right, Seq(key), "inner")
      .filter(col(rightTime) <= col(leftTime))
    val w = Window.partitionBy(col(leftId))
      .orderBy(col(rightTime).desc, col(tieBreak).desc)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same key exceeds `gapSeconds`. Two
    * windows over the same (key, time) sort — Catalyst reuses one
    * shuffle+sort for both.
    */
  def sessionize(events: DataFrame, key: String, timeCol: String,
                 idCol: String, gapSeconds: Long): DataFrame = {
    val order = Seq(col(timeCol).asc, col(idCol).asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val cum = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col(timeCol), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          (unix_micros(col(timeCol)) - unix_micros(col("__prev"))) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(cum))
      .drop("__prev", "__new")
  }

  /** SCD type-2 dimension history from a change log: each key's
    * changes, ordered by (time, id), become validity intervals —
    * `valid_from_us` inclusive, `valid_to_us` exclusive (epoch
    * micros; NULL marks the current version). ONE window over a
    * single (key) shuffle; integer outputs are render-stable for the
    * oracle. The warehouse "track every version of the dimension"
    * shape the reference's re-import cycles imply.
    */
  def scd2(changes: DataFrame, key: String, timeCol: String,
           idCol: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol).asc, col(idCol).asc)
    changes.select(col(key), col(idCol),
      unix_micros(col(timeCol).cast("timestamp")).as("valid_from_us"),
      lead(unix_micros(col(timeCol).cast("timestamp")), 1).over(w).as("valid_to_us"))
      .withColumn("is_current",
        when(col("valid_to_us").isNull, 1L).otherwise(0L))
  }

  /** Banded range self-join: all same-key row pairs within
    * `bandMicros` of each other, joined on (key, time-bucket) with the
    * left side exploded into its bucket ±1 — every qualifying pair
    * falls in exactly one of the three buckets, so no post-join
    * dedup is needed. Per-key fan-out is bounded by BAND OCCUPANCY
    * (rows per bandMicros window), not per-key history length: a user
    * with 10× more history costs 10× more bucket rows, not 100× more
    * pairs, which is what keeps the plan flat at 100 TB.
    */
  def bandedRangePairs(events: DataFrame, key: String, timeCol: String,
                       idCol: String, bandMicros: Long): DataFrame = {
    val us = unix_micros(col(timeCol))
    val bkt = (us - (us % bandMicros)) / bandMicros
    val a = events.select(col(key), col(idCol).as("id_a"), us.as("us_a"),
        explode(array(bkt - 1, bkt, bkt + 1)).as("__bkt"))
    val b = events.select(col(key), col(idCol).as("id_b"), us.as("us_b"),
        bkt.as("__bkt"))
    a.join(b, Seq(key, "__bkt"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("us_b") - col("us_a")) <= bandMicros)
      .drop("__bkt")
  }

  /** Keep the earliest row per (key...) — streaming-dedup semantics
    * (dropDuplicates) made deterministic with a total order.
    */
  def dedupEarliest(events: DataFrame, keys: Seq[String],
                    timeCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(tieBreak).asc)
    events.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** EWMA smoothing + spike detection per series — the metric-
    * monitoring pass over an event stream: each point's exponentially
    * weighted moving average over the trailing `window` points
    * (α = 1/2, so every weight is an EXACT power of two — no libm
    * pow() last-ulp drift between engines) and a relative-residual
    * spike verdict. The frame is a bounded ROWS window per key — one
    * shuffle on the series key, per-key sorted scan, O(window) work
    * per row; at 100 TB the cost is the (key, time) sort, which the
    * sessionization/as-of family already pays and reuses.
    *
    * Weighted terms are quantized to DECIMAL(18,12) before the sum
    * (q101 discipline); the geometric denominator 2 − 2^{1−n} is in
    * closed form (exact in binary). The verdict compares the rounded
    * residual against half the smoothed level — deterministic on both
    * engines.
    */
  def ewmaAnomaly(events: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valCol: String,
                  window: Int = 20): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    val withArr = events
      .select(col(idCol), col(keyCol), col(tsCol), col(valCol),
        collect_list(col(valCol)).over(w).as("__arr"))
    val n = size(col("__arr"))
    val terms = transform(col("__arr"),
      (x, i) => (x * pow(lit(0.5), (n - 1 - i).cast("double")))
        .cast(DecimalType(18, 12)))
    val num = aggregate(terms, lit(0).cast(DecimalType(28, 12)),
      (acc, t) => (acc + t).cast(DecimalType(28, 12)))
    val denom = lit(2.0) - pow(lit(0.5), (n - 1).cast("double"))
    val ewma = round(num.cast("double") / denom, 6)
    withArr
      .withColumn("ewma", ewma)
      .withColumn("resid", round(abs(col(valCol) - col("ewma")), 6))
      .withColumn("is_spike",
        col("resid") > lit(0.5) * greatest(abs(col("ewma")), lit(1.0)))
      .drop("__arr")
  }
}
