package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming EWMA spike monitor — the TRUE online recurrence
  * `ewma' = α·x + (1−α)·ewma` as `transformWithState` typed state
  * (q163 is the bounded-window batch read of the same signal; this is
  * the alerting loop that runs forever). One tiny ValueState row per
  * series — (ewma, n) packed into 16 bytes via DataOutputStream, the
  * version-stable layout discipline QuantileMonitor established — so
  * total state is O(#series), independent of stream length, with no
  * per-event history kept anywhere.
  *
  * Within a micro-batch the per-key rows are sorted by (ts, id)
  * before folding, so replaying the same batch yields the same
  * emissions regardless of shuffle arrival order — the determinism
  * contract EwmaMonitorSpec pins by replay and by comparison with a
  * sequential reference fold.
  */
object EwmaMonitor {

  case class Obs(key: String, tsMicros: Long, id: Long, value: Double)
  case class Verdict(key: String, id: Long, value: Double, ewma: Double,
                     resid: Double, isSpike: Boolean, n: Long)

  private[streaming] def pack(ewma: Double, n: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16)
    val out = new DataOutputStream(bos)
    out.writeDouble(ewma); out.writeLong(n); out.flush()
    bos.toByteArray
  }

  private[streaming] def unpack(b: Array[Byte]): (Double, Long) = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    (in.readDouble(), in.readLong())
  }

  /** Sequential reference fold — shared by the processor (per key,
    * per batch) and the spec's golden model. */
  private[graft] def fold(ewma0: Double, n0: Long, alpha: Double,
                              spikeFactor: Double,
                              obs: Seq[Obs]): (Double, Long, Seq[Verdict]) = {
    var ewma = ewma0
    var n = n0
    val out = obs.map { o =>
      ewma = if (n == 0L) o.value else alpha * o.value + (1.0 - alpha) * ewma
      n += 1
      val resid = math.abs(o.value - ewma)
      Verdict(o.key, o.id, o.value, ewma, resid,
        n > 1 && resid > spikeFactor * math.max(math.abs(ewma), 1.0), n)
    }
    (ewma, n, out)
  }

  class EwmaProcessor(alpha: Double, spikeFactor: Double)
      extends StatefulProcessor[String, Obs, Verdict] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("ewma",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[Verdict] = {
      val (e0, n0) =
        if (state.exists()) unpack(state.get()) else (0.0, 0L)
      val ordered = rows.toSeq.sortBy(o => (o.tsMicros, o.id))
      val (e1, n1, verdicts) = fold(e0, n0, alpha, spikeFactor, ordered)
      state.update(pack(e1, n1))
      verdicts.iterator
    }
  }

  /** Wire an observation stream through the processor. */
  def monitor(obs: Dataset[Obs], alpha: Double = 0.5,
              spikeFactor: Double = 0.5): Dataset[Verdict] = {
    import obs.sparkSession.implicits._
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    obs.groupByKey(_.key)
      .transformWithState(new EwmaProcessor(alpha, spikeFactor),
        TimeMode.None(), OutputMode.Append())
  }
}
