package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** SURVEY.md §2.4 — custom streaming state via
  * flatMapGroupsWithState: gap-based session windows maintained
  * per user as the stream arrives (the stateful counterpart of
  * Temporal.sessionize).
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  case class SessionState(start_us: Long, last_us: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_us: Long,
                        session_end_us: Long, n_events: Long)

  /** Emit a session when a gap > gapSeconds is observed.
    *
    * PRECONDITION (asserted): bounded single-batch replay — each
    * user's full event history arrives in one micro-batch, so every
    * session (including the trailing one) closes inside the batch and
    * no state crosses batch boundaries. That is exactly the replay
    * shape EventStream.readEvents produces (one input file → one
    * batch). A session spanning micro-batches would need
    * EventTimeTimeout + state.update and emission on timeout; the
    * merge-on-overlap `session_window` aggregation (q60) is the
    * engine-native operator that already handles that — this operator
    * demonstrates the CUSTOM-state API on the bounded shape, and
    * fails loudly (state.exists) rather than silently splitting a
    * session if fed an unbounded stream.
    */
  def sessionizeStream(events: Dataset[Ev], gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, evs, state: GroupState[List[SessionState]]) =>
          require(!state.exists,
            s"user $user seen in a second micro-batch: sessionizeStream " +
              "requires single-batch bounded replay (see scaladoc)")
          // all of this user's events are in hand: sort by (ts, id)
          // and fold into gap-delimited sessions
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var sessions = List.empty[SessionState]
          var cur: Option[SessionState] = None
          sorted.foreach { e =>
            cur match {
              case Some(c) if e.ts_us - c.last_us <= gapUs =>
                cur = Some(c.copy(last_us = e.ts_us, n = c.n + 1))
              case Some(c) =>
                sessions = c :: sessions
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              case None =>
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
            }
          }
          // marker: seeing this user again in a later batch trips the
          // single-batch precondition check above
          state.update(List.empty)
          val all = (cur.toList ::: sessions).reverse
          all.iterator.map(s => SessionOut(user, s.start_us, s.last_us, s.n))
      }
  }

  case class TsEv(user_id: Long, ts: Timestamp, event_id: Long)

  /** TRUE cross-batch sessionization: the open session lives in the
    * state store between micro-batches (state.update) and is emitted
    * when the event-time watermark passes its close time
    * (EventTimeTimeout + setTimeoutTimestamp). A session spanning
    * micro-batches is emitted ONCE, whole — the semantics the bounded
    * variant above deliberately does not claim. Requires batches to
    * arrive in per-key event-time order (true for time-ordered
    * replay and for watermarked sources); events later than the
    * watermark are dropped by the engine before reaching the state
    * function.
    */
  def sessionizeUnbounded(events: Dataset[TsEv], gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, evs, state: GroupState[SessionState]) =>
          def usOf(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
          if (state.hasTimedOut) {
            // watermark passed last_us + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start_us, s.last_us, s.n))
          } else {
            val sorted = evs.toSeq
              .map(e => (usOf(e.ts), e.event_id)).sortBy(identity).map(_._1)
            var closed = List.empty[SessionState]
            var cur: Option[SessionState] = state.getOption
            sorted.foreach { us =>
              cur match {
                case Some(c) if us - c.last_us <= gapUs =>
                  cur = Some(c.copy(last_us = us, n = c.n + 1))
                case Some(c) =>
                  closed = c :: closed
                  cur = Some(SessionState(us, us, 1))
                case None =>
                  cur = Some(SessionState(us, us, 1))
              }
            }
            cur.foreach { c =>
              state.update(c)
              // fire once the watermark proves no event can extend it
              state.setTimeoutTimestamp((c.last_us / 1000) + gapSeconds * 1000)
            }
            closed.reverse.iterator
              .map(s => SessionOut(user, s.start_us, s.last_us, s.n))
          }
      }
  }

  /** The open session plus its registered timer — transformWithState
    * keeps timers out-of-band, so the state must remember which timer
    * is live to cancel it when new events extend the session.
    */
  case class TwsState(start_us: Long, last_us: Long, n: Long, timer_ms: Long)

  /** [[sessionizeUnbounded]] re-expressed on Spark 4's
    * transformWithState (StatefulProcessor + typed ValueState +
    * event-time timers) — the successor API to
    * flatMapGroupsWithState. Semantics are identical: the open
    * session lives in the state store across micro-batches and is
    * emitted whole when the event-time watermark passes
    * last_event + gap. Differences that matter at scale: state is a
    * named, schema'd column family (RocksDB provider required —
    * `spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider`), timers are engine-managed
    * rather than one implicit timeout per key, and state schema can
    * evolve between restarts.
    */
  class GapSessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, TsEv, SessionOut] {
    @transient private var open: ValueState[TwsState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[TwsState]("open_session",
        Encoders.product[TwsState], TTLConfig.NONE)

    private def usOf(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000

    override def handleInputRows(user: Long, rows: Iterator[TsEv],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.map(e => (usOf(e.ts), e.event_id))
        .sortBy(identity).map(_._1)
      if (sorted.isEmpty) return Iterator.empty
      var closed = List.empty[TwsState]
      var cur: Option[TwsState] = if (open.exists) Some(open.get) else None
      // the previous batch's timer no longer reflects the session end
      cur.filter(_.timer_ms > 0).foreach(c => getHandle.deleteTimer(c.timer_ms))
      sorted.foreach { us =>
        cur match {
          case Some(c) if us - c.last_us <= gapUs =>
            cur = Some(c.copy(last_us = us, n = c.n + 1))
          case Some(c) =>
            closed = c :: closed
            cur = Some(TwsState(us, us, 1, 0))
          case None =>
            cur = Some(TwsState(us, us, 1, 0))
        }
      }
      cur.foreach { c =>
        val fireAt = (c.last_us / 1000) + gapUs / 1000
        open.update(c.copy(timer_ms = fireAt))
        getHandle.registerTimer(fireAt)
      }
      closed.reverse.iterator
        .map(s => SessionOut(user, s.start_us, s.last_us, s.n))
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!open.exists) return Iterator.empty
      val s = open.get
      // a stale timer (session extended since) must not flush early
      if (s.timer_ms != info.getExpiryTimeInMs) return Iterator.empty
      open.clear()
      Iterator.single(SessionOut(user, s.start_us, s.last_us, s.n))
    }
  }

  /** [[sessionizeUnbounded]] on the transformWithState API — see
    * [[GapSessionProcessor]]. */
  def sessionizeTws(events: Dataset[TsEv], gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .transformWithState(new GapSessionProcessor(gapSeconds * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Run the stateful sessionizer over the replayed events table. */
  def run(spark: SparkSession, dir: String, gapSeconds: Long): DataFrame = {
    import spark.implicits._
    val evs = EventStream.readEvents(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[Ev]
    val out = sessionizeStream(evs, gapSeconds)
    EventStream.runToCompletionAppend(spark, out.toDF(), "graft_sessions_stream")
  }
}
