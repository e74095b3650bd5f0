package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming SAMPLE-RATIO-MISMATCH monitor — the online form of
  * q314's batch SRM gate: as assignment events arrive, each
  * experiment's running (arm0, arm1) counts update and every
  * micro-batch emits one health row with the 1-df chi-square against
  * the expected 50/50 split and its p-value. An experiment whose
  * split drifts improbably off flags within minutes of the
  * assignment-pipeline bug landing, instead of at the end-of-week
  * readout — the difference between discarding one day and
  * discarding the whole experiment.
  *
  * State is one 24-byte ValueState row per experiment — (n0, n1,
  * nBad) in an explicit DataOutputStream layout (the QuantileMonitor
  * version-stability discipline; 16-byte pre-nBad state is read
  * back with nBad = 0) — O(#experiments), independent of stream
  * length. Counts are commutative, so unlike the CUSUM fold
  * no within-batch ordering is needed: replay is emission-identical
  * under any shuffle arrival order by construction.
  *
  * An assignment whose arm is OUTSIDE {0, 1} (a corrupt field, a
  * third-arm rollout bleeding into a 50/50 test) is never silently
  * folded into arm 0 — that would skew the chi-square toward a
  * false flag; it increments the `nBad` health counter instead, so
  * the malformed-assignment bug surfaces as its own signal.
  *
  * The p-value evaluates the SAME Abramowitz–Stegun 26.2.17 tail
  * polynomial the batch engines share via `functions/PValues`,
  * AND applies the batch query's output rounding (chi² to 6
  * decimals HALF_UP before the tail, p to 10) — so the streaming
  * flag and the q314 batch flag agree EXACTLY on the same counts,
  * not merely up to rounding (spec-pinned against the SQL
  * evaluation and the batch rows).
  */
object SrmMonitor {

  case class Assign(experiment: String, tsMicros: Long, id: Long, arm: Int)
  case class Health(experiment: String, n0: Long, n1: Long, nBad: Long,
                    chi2: Double, pValue: Double, srmFlag: Boolean)

  /** Two-sided normal tail p — the Scala twin of PValues.twoSidedP
    * (same A&S 26.2.17 coefficients, same least-clamp). */
  private[graft] def twoSidedP(z: Double): Double = {
    val t = 1.0 / (1.0 + 0.2316419 * math.abs(z))
    val poly = t * (0.31938153 + t * (-0.356563782 + t *
      (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
    math.min(1.0,
      2.0 * math.exp(-z * z / 2.0) * 0.3989422804014327 * poly)
  }

  private[graft] def pack(n0: Long, n1: Long, nBad: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream(24)
    val out = new DataOutputStream(bos)
    out.writeLong(n0); out.writeLong(n1); out.writeLong(nBad); out.flush()
    bos.toByteArray
  }

  private[graft] def unpack(b: Array[Byte]): (Long, Long, Long) = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    // 16-byte layout predates the nBad counter — read it as nBad = 0
    (in.readLong(), in.readLong(), if (b.length >= 24) in.readLong() else 0L)
  }

  // BigDecimal.valueOf (shortest decimal repr — Double.toString), NOT
  // `new BigDecimal` (exact binary expansion): Spark's Round on
  // doubles goes through valueOf, and on a value whose shortest repr
  // ties at the rounding digit the two constructions round apart —
  // valueOf here keeps the "bit-identical to the q314 batch row"
  // claim literal.
  private def round(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Health verdict from cumulative counts — shared by the processor
    * and the spec's golden model. χ² against 50/50 reduces to
    * (n0−n1)²/n; chi² rounds to 6 decimals (HALF_UP) BEFORE the tail
    * polynomial and p to 10 after — the exact output rounding of the
    * q314 batch query, so the two flags cannot disagree. */
  private[graft] def verdict(experiment: String, n0: Long, n1: Long,
                             nBad: Long, alpha: Double): Health = {
    val n = n0 + n1
    val chi2 =
      if (n == 0) 0.0
      else {
        val d = (n0 - n1).toDouble
        round(d * d / n, 6)
      }
    val p = round(twoSidedP(math.sqrt(chi2)), 10)
    Health(experiment, n0, n1, nBad, chi2, p, p < alpha)
  }

  class SrmProcessor(alpha: Double)
      extends StatefulProcessor[String, Assign, Health] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("srm",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Assign],
                                 timerValues: TimerValues): Iterator[Health] = {
      var (n0, n1, nBad) =
        if (state.exists()) unpack(state.get()) else (0L, 0L, 0L)
      rows.foreach { a =>
        if (a.arm == 0) n0 += 1
        else if (a.arm == 1) n1 += 1
        else nBad += 1
      }
      state.update(pack(n0, n1, nBad))
      Iterator.single(verdict(key, n0, n1, nBad, alpha))
    }
  }

  /** Wire an assignment stream through the processor; one health row
    * per (experiment, micro-batch). */
  def monitor(assignments: Dataset[Assign],
              alpha: Double = 0.001): Dataset[Health] = {
    import assignments.sparkSession.implicits._
    require(alpha > 0.0 && alpha < 1.0, "0 < alpha < 1")
    assignments.groupByKey(_.experiment)
      .transformWithState(new SrmProcessor(alpha),
        TimeMode.None(), OutputMode.Append())
  }
}
