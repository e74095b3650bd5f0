package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.SpaceSavingSketch

/** Streaming frequent-token monitoring — SURVEY.md §2.4: the
  * Space-Saving sketch (q56's `TypedImperativeAggregate`) re-hosted as
  * `transformWithState` typed state, so heavy hitters are tracked
  * ONLINE over an unbounded stream instead of recomputed per corpus.
  *
  * Scale shape: tokens shard by content hash into `nShards` keys, each
  * shard owning one bounded sketch (a single `ValueState[Array[Byte]]`
  * row — state size is nShards × O(capacity), independent of stream
  * length). Because the sharding is a DISJOINT partition of the token
  * space, every token's full count lives in exactly one shard, so the
  * global top-k is contained in the union of per-shard top-k's (any
  * token globally above rank k has at most k−1 tokens above it in its
  * own shard). Each micro-batch appends the shard's CURRENT top-k;
  * estimates only grow, so a consumer takes max-per-token (or the
  * latest batch) for the running answer.
  */
object FrequentTokens {

  case class Tok(shard: Long, token: String)
  case class TokenEst(shard: Long, token: String, est: Long, err: Long)

  private[streaming] def serialize(sk: SpaceSavingSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeObject(sk); out.close()
    bos.toByteArray
  }

  private[streaming] def deserialize(bytes: Array[Byte]): SpaceSavingSketch =
    new ObjectInputStream(new ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[SpaceSavingSketch]

  /** One sketch per shard key in a single binary ValueState row. */
  class SketchProcessor(capacity: Int, k: Int)
      extends StatefulProcessor[Long, Tok, TokenEst] {
    @transient private var state: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Array[Byte]]("sketch",
        Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(shard: Long, rows: Iterator[Tok],
                                 timerValues: TimerValues): Iterator[TokenEst] = {
      val sk =
        if (state.exists()) deserialize(state.get())
        else new SpaceSavingSketch(capacity)
      rows.foreach(r => sk.add(r.token))
      state.update(serialize(sk))
      sk.topK(k).iterator.map { case (t, est, err) => TokenEst(shard, t, est, err) }
    }
  }

  /** Wire a token stream (already sharded) through the processor. */
  def monitor(tokens: Dataset[Tok], nShards: Int, capacity: Int,
              k: Int): Dataset[TokenEst] = {
    import tokens.sparkSession.implicits._
    require(nShards >= 1 && capacity >= 1 && k >= 1)
    tokens
      .groupByKey(_.shard)
      .transformWithState(new SketchProcessor(capacity, k),
        TimeMode.None(), OutputMode.Append())
  }
}
