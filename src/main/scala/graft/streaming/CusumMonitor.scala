package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming two-sided CUSUM level-shift monitor — the online form of
  * q272's batch changepoint scan (Page, Biometrika'54), and the SPC
  * chart EWMA monitoring (EwmaMonitor) is usually paired with: EWMA
  * flags SPIKES, CUSUM flags sustained small SHIFTS a spike band never
  * trips on. Classic SPC parameterization: a FIXED reference (target)
  * with slack k, so the recursion needs no global mean —
  *
  *   s⁺' = max(0, s⁺ + (x − target − slack))
  *   s⁻' = max(0, s⁻ + (target − x − slack))
  *
  * and an alarm fires when either side exceeds the decision interval
  * h, after which both sides RESET (the restart-detection convention,
  * so a second shift after remediation raises a second alarm instead
  * of saturating).
  *
  * One 24-byte ValueState row per series — (s⁺, s⁻, n) in an explicit
  * DataOutputStream layout (the QuantileMonitor version-stability
  * discipline; never Java object serialization) — so total state is
  * O(#series), independent of stream length. Within a micro-batch the
  * per-key rows fold in (ts, id) order, making replay
  * emission-identical regardless of shuffle arrival order.
  */
object CusumMonitor {

  case class Obs(key: String, tsMicros: Long, id: Long, value: Double)
  case class Verdict(key: String, id: Long, value: Double,
                     sPos: Double, sNeg: Double, alarm: Boolean, n: Long)

  private[graft] def pack(sPos: Double, sNeg: Double, n: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream(24)
    val out = new DataOutputStream(bos)
    out.writeDouble(sPos); out.writeDouble(sNeg); out.writeLong(n); out.flush()
    bos.toByteArray
  }

  private[graft] def unpack(b: Array[Byte]): (Double, Double, Long) = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    (in.readDouble(), in.readDouble(), in.readLong())
  }

  /** Sequential reference fold — shared by the processor (per key,
    * per batch) and the spec's golden model. */
  private[graft] def fold(s0: (Double, Double, Long), target: Double,
                          slack: Double, h: Double,
                          obs: Seq[Obs]): ((Double, Double, Long), Seq[Verdict]) = {
    var sPos = s0._1; var sNeg = s0._2; var n = s0._3
    val out = obs.map { o =>
      sPos = math.max(0.0, sPos + (o.value - target - slack))
      sNeg = math.max(0.0, sNeg + (target - o.value - slack))
      n += 1
      val alarm = sPos > h || sNeg > h
      val v = Verdict(o.key, o.id, o.value, sPos, sNeg, alarm, n)
      if (alarm) { sPos = 0.0; sNeg = 0.0 }
      v
    }
    ((sPos, sNeg, n), out)
  }

  class CusumProcessor(target: Double, slack: Double, h: Double)
      extends StatefulProcessor[String, Obs, Verdict] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("cusum",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[Verdict] = {
      val s0 = if (state.exists()) unpack(state.get()) else (0.0, 0.0, 0L)
      val ordered = rows.toSeq.sortBy(o => (o.tsMicros, o.id))
      val (s1, verdicts) = fold(s0, target, slack, h, ordered)
      state.update(pack(s1._1, s1._2, s1._3))
      verdicts.iterator
    }
  }

  /** Wire an observation stream through the processor. */
  def monitor(obs: Dataset[Obs], target: Double, slack: Double,
              h: Double): Dataset[Verdict] = {
    import obs.sparkSession.implicits._
    require(slack >= 0.0 && h > 0.0, "slack >= 0 and h > 0")
    obs.groupByKey(_.key)
      .transformWithState(new CusumProcessor(target, slack, h),
        TimeMode.None(), OutputMode.Append())
  }
}
