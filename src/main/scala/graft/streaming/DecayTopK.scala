package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming TRENDING monitor — SURVEY §2.4: exponentially decayed
  * heavy hitters. [[FrequentTokens]] (45f) answers "most frequent
  * EVER"; a trending feed asks "most frequent NOW" — the difference
  * is a decay term, and the decayed counter is the classic trending /
  * burst-surfacing primitive (the forward-decay family, Cormode'09).
  *
  * Determinism contract: λ = 1/2 per micro-batch in EXACT integer
  * arithmetic — every count the shard tracks is floor-halved once per
  * batch the shard receives, then the batch's increments add and
  * zero counts prune. No floats, no wall clock: the same replayed
  * batch sequence produces bit-identical trajectories (the engine's
  * reproducibility discipline applied to streaming state).
  *
  * Boundedness: a token untouched for log₂(c) batches decays to zero
  * and leaves the map, so state per shard tracks only the recent-
  * activity vocabulary — independent of stream length; `maxEntries`
  * additionally hard-caps the map (deterministic (count desc, token)
  * survivor order). One serialized map per shard key = state rows ≤
  * nShards, the FrequentTokens state shape.
  */
object DecayTopK {

  case class Tok(shard: Long, token: String)

  /** `seq` is the shard's batch counter — consumers take the max-seq
    * slice as the current trending answer. */
  case class Trend(shard: Long, seq: Long, token: String, decayed: Long)

  /** Checkpoint-stable state layout (the DialogMonitor discipline —
    * an explicit versioned byte format, NOT Java object serialization,
    * so a Scala/JDK upgrade can never orphan existing streaming
    * state): [int version=1][long seq][int n] then n × ([UTF token]
    * [long count]). */
  private val StateVersion = 1

  private[graft] def serialize(m: Map[String, Long], seq: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(StateVersion)
    out.writeLong(seq)
    out.writeInt(m.size)
    m.foreach { case (tok, c) => out.writeUTF(tok); out.writeLong(c) }
    out.close()
    bos.toByteArray
  }

  private[graft] def deserialize(bytes: Array[Byte]): (Map[String, Long], Long) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val v = in.readInt()
    require(v == StateVersion, s"DecayTopK state version $v, expected $StateVersion")
    val seq = in.readLong()
    val n = in.readInt()
    val b = Map.newBuilder[String, Long]
    var i = 0
    while (i < n) { b += ((in.readUTF(), in.readLong())); i += 1 }
    (b.result(), seq)
  }

  class DecayProcessor(k: Int, maxEntries: Int)
      extends StatefulProcessor[Long, Tok, Trend] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("decayed",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(shard: Long, rows: Iterator[Tok],
                                 timerValues: TimerValues): Iterator[Trend] = {
      val (prev, prevSeq) =
        if (state.exists()) deserialize(state.get()) else (Map.empty[String, Long], 0L)
      val seq = prevSeq + 1
      val decayed = prev.iterator
        .map { case (t, c) => (t, c >> 1) }
        .filter(_._2 > 0L).toMap
      val incr = rows.foldLeft(Map.empty[String, Long]) { (m, r) =>
        m.updated(r.token, m.getOrElse(r.token, 0L) + 1L)
      }
      val merged = incr.foldLeft(decayed) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      val capped =
        if (merged.size <= maxEntries) merged
        else merged.toSeq.sortBy { case (t, c) => (-c, t) }
          .take(maxEntries).toMap
      state.update(serialize(capped, seq))
      capped.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
        .iterator.map { case (t, c) => Trend(shard, seq, t, c) }
    }
  }

  /** Wire a token stream (already sharded) through the processor. */
  def monitor(tokens: Dataset[Tok], k: Int, maxEntries: Int = 4096): Dataset[Trend] = {
    import tokens.sparkSession.implicits._
    require(k >= 1 && maxEntries >= k)
    tokens
      .groupByKey(_.shard)
      .transformWithState(new DecayProcessor(k, maxEntries),
        TimeMode.None(), OutputMode.Append())
  }
}
