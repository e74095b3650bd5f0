package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.KllDoubleSketch

/** Streaming quantile monitoring over CONTINUOUS value domains — the
  * complement of [[QuantileMonitor]]: that operator's exactness rests
  * on a bounded value domain (full histogram as state), which a
  * continuous metric (latency, loss, revenue) does not have. Here
  * each series key owns ONE KLL sketch in a binary ValueState row —
  * state is O(k·log n) per key regardless of stream length or value
  * cardinality — and every micro-batch emits the key's CURRENT
  * quantile estimates, each within the sketch's spec-pinned ≤ 2%
  * rank error of the exact stream-so-far quantile.
  *
  * The sketch's byte layout is the shared version-stable
  * `KllDoubleSketch.serialize` (DataOutputStream) — the same bytes
  * the SQL aggregate shuffles as partial state, so a checkpointed
  * store survives dependency upgrades (the QuantileMonitor
  * discipline).
  */
object KllMonitor {

  case class Obs(key: String, value: Double)
  case class QuantEst(key: String, n: Long, retained: Int,
                      p10: Double, p50: Double, p90: Double)

  class KllProcessor(k: Int)
      extends StatefulProcessor[String, Obs, QuantEst] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("kll",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[QuantEst] = {
      val sk =
        if (state.exists()) KllDoubleSketch.deserialize(state.get())
        else new KllDoubleSketch(k)
      rows.foreach(o => sk.add(o.value))
      state.update(KllDoubleSketch.serialize(sk))
      val qs = sk.quantiles(Seq(0.1, 0.5, 0.9))
      Iterator.single(
        QuantEst(key, sk.totalN, sk.retained, qs(0), qs(1), qs(2)))
    }
  }

  /** Wire an observation stream through the per-key sketch. */
  def monitor(obs: Dataset[Obs], k: Int = 200): Dataset[QuantEst] = {
    import obs.sparkSession.implicits._
    require(k >= 8)
    obs.groupByKey(_.key)
      .transformWithState(new KllProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
