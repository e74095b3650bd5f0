package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming EXACT quantile monitoring — SURVEY.md §2.4 (round 8):
  * the bounded-VALUE-DOMAIN trick that makes q53/q127's exact grouped
  * quantiles scale (aggregate counts per value, rank over the domain,
  * never over rows) applied ONLINE. Distribution metrics like doc
  * length, token count, or quality score have domains that are tiny
  * relative to any stream (thousands of distinct values), so the full
  * histogram is legitimate streaming state and the emitted quantiles
  * are EXACT — no GK/t-digest error bar, no re-scan of the stream.
  *
  * Scale shape: values shard by `value % nShards` into disjoint key
  * groups; each shard owns its slice of the histogram in ONE binary
  * ValueState row (state = O(domain), independent of stream length).
  * Per micro-batch each touched shard emits its CURRENT (value,
  * count) rows; counts only grow, so a consumer takes max-per-value
  * for the running histogram and ranks the ≤ |domain| rows for exact
  * quantiles ([[histogramQuantiles]]).
  */
object QuantileMonitor {

  case class Obs(shard: Long, value: Int)
  case class ValueCount(shard: Long, value: Int, count: Long)

  // Version-stable state layout: sorted (int value, long count) pairs
  // via DataOutputStream, NOT Java object serialization — a HashMap's
  // ObjectOutputStream byte layout shifts across Scala/JDK versions,
  // which would brick a checkpointed state store on upgrade.
  private def serialize(m: scala.collection.mutable.HashMap[Int, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (v, c) => out.writeInt(v); out.writeLong(c) }
    out.close()
    bos.toByteArray
  }

  private def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[Int, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = scala.collection.mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < n) { m.update(in.readInt(), in.readLong()); i += 1 }
    m
  }

  /** One histogram slice per shard in a single binary ValueState row. */
  class HistogramProcessor extends StatefulProcessor[Long, Obs, ValueCount] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("hist",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(shard: Long, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[ValueCount] = {
      val m =
        if (state.exists()) deserialize(state.get())
        else scala.collection.mutable.HashMap.empty[Int, Long]
      rows.foreach(r => m.update(r.value, m.getOrElse(r.value, 0L) + 1L))
      state.update(serialize(m))
      m.iterator.map { case (v, c) => ValueCount(shard, v, c) }.toSeq.iterator
    }
  }

  /** Wire an integer-valued observation stream through the processor.
    * `shard = value % nShards` must already be set (disjoint by
    * construction, so each value's full count lives in one shard). */
  def monitor(obs: Dataset[Obs]): Dataset[ValueCount] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.shard)
      .transformWithState(new HistogramProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Exact quantiles from a (value, count) histogram frame — the rank
    * window runs over ≤ |domain| rows, never observations. Returns
    * one row per requested q: (q, value) where value is the smallest
    * v with cumulative count ≥ ⌈q·total⌉ (inclusive/nearest-rank). */
  def histogramQuantiles(hist: DataFrame, qs: Seq[Double]): DataFrame = {
    // Accept the monitor's RAW emitted output: each micro-batch
    // re-emits a touched shard's full current counts, so counts for a
    // (shard, value) repeat across emissions and only grow. Fold to
    // the running histogram with max-per-(shard,value) FIRST, then sum
    // across shards (disjoint by construction). A plain (value, count)
    // frame — no shard column — passes through the same path
    // unchanged, since each value then has one implicit shard.
    val perShard =
      if (hist.columns.contains("shard"))
        hist.groupBy(col("shard"), col("value")).agg(max(col("count")).as("count"))
      else hist.select(col("value"), col("count"))
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perShard
      .groupBy(col("value")).agg(sum(col("count")).as("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .crossJoin(broadcast(
        perShard.agg(sum(col("count")).cast("long").as("total"))))
    qs.map { q =>
      cum.filter(col("cum") >= ceil(lit(q) * col("total")))
        .orderBy(col("value"))
        .limit(1)
        .select(lit(q).as("q"), col("value"))
    }.reduce(_ unionByName _)
  }
}
