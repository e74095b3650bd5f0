package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Emit a session when a gap > gapSeconds is observed (plus the
    * trailing open session on timeout/end-of-stream via the final
    * watermark advance — for bounded replay we emit open sessions
    * when the group sees no more input).
    */
  def sessionizeStream(events: Dataset[Ev], gapSeconds: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (user, evs, state: GroupState[List[SessionState]]) =>
          // batch-replay friendly: all of a user's events arrive in one
          // group; sort by (ts, id) and fold into sessions.
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var sessions = List.empty[SessionState]
          var cur: Option[SessionState] = state.getOption.flatMap(_.headOption)
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
          // close the trailing session too (bounded replay semantics)
          val all = (cur.toList ::: sessions).reverse
          state.remove()
          all.iterator.map(s => SessionOut(user, s.start_us, s.last_us, s.n))
      }
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
