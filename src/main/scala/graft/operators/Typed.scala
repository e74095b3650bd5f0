package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SURVEY §2.1/§2.5 — the typed `Dataset[T]` face of the engine:
  * case-class rows, `groupByKey`, and a custom typed [[Aggregator]].
  * Everything still compiles to the same Catalyst plans as the
  * untyped API (deserialization happens only at the groupByKey key
  * function and the Aggregator reduce — both codegen'd over the
  * product encoder), so type safety costs no plan quality: the
  * aggregation is a partial-agg-friendly two-phase HashAggregate
  * exactly like the DataFrame equivalent.
  *
  * The reference consumes typed rows implicitly (R data.frames carry
  * column classes); here the compiler enforces them.
  */
object Typed {

  /** One order, money as exact integer cents. */
  final case class OrderRow(o_orderkey: Long, o_custkey: Long, cents: Long)

  /** Per-customer spend summary. */
  final case class CustSpend(o_custkey: Long, n_orders: Long,
                             total_cents: Long, max_order_cents: Long)

  /** Typed aggregator: (count, sum, max) over cents in one buffer —
    * associative + commutative, so map-side partial aggregation
    * applies as usual.
    */
  object SpendAgg extends Aggregator[OrderRow, (Long, Long, Long), (Long, Long, Long)] {
    override def zero: (Long, Long, Long) = (0L, 0L, Long.MinValue)
    override def reduce(b: (Long, Long, Long), a: OrderRow): (Long, Long, Long) =
      (b._1 + 1, b._2 + a.cents, math.max(b._3, a.cents))
    override def merge(x: (Long, Long, Long), y: (Long, Long, Long)): (Long, Long, Long) =
      (x._1 + y._1, x._2 + y._2, math.max(x._3, y._3))
    override def finish(r: (Long, Long, Long)): (Long, Long, Long) = r
    override def bufferEncoder: Encoder[(Long, Long, Long)] = Encoders.product
    override def outputEncoder: Encoder[(Long, Long, Long)] = Encoders.product
  }

  /** Orders as a typed Dataset (price → exact cents at the boundary). */
  def orders(ordersDf: DataFrame)(implicit s: SparkSession): Dataset[OrderRow] = {
    import s.implicits._
    ordersDf.select(col("o_orderkey"), col("o_custkey"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .as[OrderRow]
  }

  /** Per-customer spend via typed groupByKey + Aggregator. */
  def custSpend(ds: Dataset[OrderRow])(implicit s: SparkSession): Dataset[CustSpend] = {
    import s.implicits._
    ds.groupByKey(_.o_custkey)
      .agg(SpendAgg.toColumn)
      .map { case (k, (n, total, mx)) => CustSpend(k, n, total, mx) }
  }
}
