package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming SFT dialog-validity GATE — q194's audit as an online
  * `transformWithState` monitor: every arriving turn emits the
  * RUNNING audit for its dialog (turn counts by role, alternation
  * violations, longest same-role run, opened-with-user), so a
  * collection pipeline can drop a malformed dialog the moment it
  * breaks alternation instead of discovering it in the nightly batch.
  * Ends-with-assistant is inherently a close-of-dialog property —
  * the batch audit (q194) owns it; the stream reports everything
  * knowable mid-flight.
  *
  * State is ONE fixed 50-byte row per dialog (six longs + two role
  * bytes packed via DataOutputStream — the QuantileMonitor layout
  * discipline), so total state is O(#dialogs) regardless of stream
  * length. Within a micro-batch, per-key rows are sorted by (ts, id)
  * before folding — replay-deterministic regardless of shuffle
  * arrival order, the EwmaMonitor contract.
  */
object DialogMonitor {

  case class Turn(dialogId: Long, tsMicros: Long, id: Long, role: String)
  case class Audit(dialogId: Long, id: Long, role: String, nTurns: Long,
                   nUser: Long, nAssistant: Long, nViolations: Long,
                   maxRun: Long, startsUser: Boolean, violation: Boolean,
                   validSoFar: Boolean)

  private case class S(nTurns: Long, nUser: Long, nAssistant: Long,
                       nViol: Long, maxRun: Long, curRun: Long,
                       firstRole: Byte, lastRole: Byte)

  private val NoRole: Byte = 0
  private def roleByte(r: String): Byte = if (r == "user") 1 else 2

  private def pack(s: S): Array[Byte] = {
    val bos = new ByteArrayOutputStream(50)
    val out = new DataOutputStream(bos)
    out.writeLong(s.nTurns); out.writeLong(s.nUser); out.writeLong(s.nAssistant)
    out.writeLong(s.nViol); out.writeLong(s.maxRun); out.writeLong(s.curRun)
    out.writeByte(s.firstRole); out.writeByte(s.lastRole)
    out.flush()
    bos.toByteArray
  }

  private def unpack(b: Array[Byte]): S = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    S(in.readLong(), in.readLong(), in.readLong(), in.readLong(),
      in.readLong(), in.readLong(), in.readByte(), in.readByte())
  }

  /** Sequential reference fold — shared by the processor (per key,
    * per batch) and the spec's golden model. */
  private[graft] def fold(s0: Option[(Long, Long, Long, Long, Long, Long, Byte, Byte)],
                          turns: Seq[Turn]): ((Long, Long, Long, Long, Long, Long, Byte, Byte), Seq[Audit]) = {
    var s = s0.map(t => S(t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8))
      .getOrElse(S(0L, 0L, 0L, 0L, 0L, 0L, NoRole, NoRole))
    val out = turns.map { t =>
      val rb = roleByte(t.role)
      val violation = s.lastRole != NoRole && s.lastRole == rb
      val curRun = if (violation) s.curRun + 1 else 1L
      s = S(s.nTurns + 1,
        s.nUser + (if (rb == 1) 1L else 0L),
        s.nAssistant + (if (rb == 2) 1L else 0L),
        s.nViol + (if (violation) 1L else 0L),
        math.max(s.maxRun, curRun), curRun,
        if (s.firstRole == NoRole) rb else s.firstRole, rb)
      Audit(t.dialogId, t.id, t.role, s.nTurns, s.nUser, s.nAssistant,
        s.nViol, s.maxRun, s.firstRole == 1, violation,
        s.nViol == 0L && s.firstRole == 1)
    }
    ((s.nTurns, s.nUser, s.nAssistant, s.nViol, s.maxRun, s.curRun,
      s.firstRole, s.lastRole), out)
  }

  class DialogProcessor extends StatefulProcessor[Long, Turn, Audit] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("dialog",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Turn],
                                 timerValues: TimerValues): Iterator[Audit] = {
      val s0 = if (state.exists()) {
        val s = unpack(state.get())
        Some((s.nTurns, s.nUser, s.nAssistant, s.nViol, s.maxRun, s.curRun,
          s.firstRole, s.lastRole))
      } else None
      val ordered = rows.toSeq.sortBy(t => (t.tsMicros, t.id))
      val (s1, audits) = fold(s0, ordered)
      state.update(pack(S(s1._1, s1._2, s1._3, s1._4, s1._5, s1._6,
        s1._7, s1._8)))
      audits.iterator
    }
  }

  /** Wire a turn stream through the processor. */
  def monitor(turns: Dataset[Turn]): Dataset[Audit] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.dialogId)
      .transformWithState(new DialogProcessor(),
        TimeMode.None(), OutputMode.Append())
  }
}
