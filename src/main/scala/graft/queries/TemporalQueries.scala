package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Temporal
import graft.streaming.EventStream

/** SURVEY.md §2.4 — temporal queries over events (+ the streaming
  * engine run synchronously for q42).
  */
object TemporalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // §2.4 #41 — event-time tumbling window aggregation (batch).
    "q41_windowed_agg" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    },

    // §2.4 #41b — time-series resample with gap fill + forward fill
    // (round 6): the hourly grid is materialized for EVERY
    // (event_type, hour) cell across the observed span — missing
    // buckets get n_events = 0 and carry the last observed sum_value
    // forward. The spine is hours × types (tiny at any corpus scale:
    // it grows with TIME, not data), broadcast against the aggregated
    // hourly table; the forward fill is a partition-parallel window
    // per event_type.
    "q108_gap_fill" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val hourly = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      val spine = ev
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hour"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.crossJoin(broadcast(ev.select(col("event_type")).distinct()))
        .join(hourly, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("sum_value"), ignoreNulls = true).over(w).as("sum_value_ffill"))
        .orderBy(col("event_type"), col("hour"))
    },

    // §2.4 #42 — the SAME aggregation through Structured Streaming
    // (file-replay source, watermark, memory sink): batch parity is
    // the oracle.
    "q42_stream_windowed" -> { (s, d) =>
      val res = EventStream.runToCompletion(s,
        EventStream.windowedAgg(EventStream.readEvents(s, d)), "graft_q42")
      res.orderBy(col("window_start"), col("event_type"))
    },

    // §2.4 #43 — as-of join: latest order at or before each event.
    "q43_asof_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, d)
        .select(col("o_custkey").as("user_id"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
      Temporal.asofJoin(ev, ord, key = "user_id",
        leftTime = "ts", rightTime = "o_orderdate",
        leftId = "event_id", tieBreak = "o_orderkey")
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // §2.4 #43 — the SAME as-of join through the custom Catalyst
    // operator (AsOfJoin logical node → AsOfJoinExec sort-merge
    // physical plan): one streaming merge per co-partition, no
    // history fan-out, no window. Checked against the identical
    // oracle as q43.
    "q43b_asof_native" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, d)
        .select(col("o_custkey").as("user_id"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .withColumnRenamed("user_id", "r_user_id")
      graft.plans.AsOfJoinPlan.asofJoin(ev, ord,
        leftKey = "user_id", rightKey = "r_user_id",
        leftTime = "ts", rightTime = "o_orderdate", tieBreak = "o_orderkey")
        .filter(col("o_orderkey").isNotNull)
        .select(col("event_id"), col("user_id"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // §2.4 (round 7) — as-of join with DIRECTION + TOLERANCE through
    // the native operator (the pandas merge_asof surface): for each
    // event, the NEXT event by the same user STRICTLY after it and
    // within 3 days — time-to-next-action attribution. Same single
    // streaming merge per co-partition as q43b; the forward candidate
    // is the merge cursor's head, so direction costs nothing extra,
    // and the tolerance is a per-row arithmetic check, not a join
    // predicate that would re-fan the history.
    "q120_asof_forward" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val nxt = Tables.events(s, d)
        .select(col("event_id").as("next_event_id"),
          col("user_id").as("r_user_id"), col("ts").as("next_ts"))
      graft.plans.AsOfJoinPlan.asofJoin(ev, nxt,
          leftKey = "user_id", rightKey = "r_user_id",
          leftTime = "ts", rightTime = "next_ts",
          tieBreak = "next_event_id",
          direction = "forward", toleranceMicros = 3L * 86400 * 1000000)
        .filter(col("next_event_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("next_event_id"),
          (unix_micros(col("next_ts")) - unix_micros(col("ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    },

    // §2.5 — native INTERVAL JOIN (q51's close-pair query on the
    // fourth whole-operator Catalyst extension): both event streams
    // co-partition on user and sort by (user, ts); each partition is
    // one streaming merge holding only the ±60 s ACTIVE WINDOW of
    // right rows in a deque — no band fan-out, no distinct, no
    // per-key history re-scan (Spark's SMJ would re-loop the whole
    // key group per row and post-filter the band predicate).
    "q129_interval_native" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val a = ev.select(col("user_id"), col("ts"), col("event_id"))
      val b = ev.select(col("user_id").as("user_id_b"),
        col("ts").as("ts_b"), col("event_id").as("event_id_b"))
      graft.plans.IntervalJoinPlan.intervalJoin(a, b,
          leftKey = "user_id", rightKey = "user_id_b",
          leftTime = "ts", rightTime = "ts_b",
          loMicros = -60000000L, hiMicros = 60000000L)
        .filter(col("event_id") < col("event_id_b"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_close_pairs"))
        .orderBy(col("user_id"))
    },

    // §2.4 #44 — gap-based sessionization (30-minute gap).
    "q44_sessionize" -> { (s, d) =>
      Temporal.sessionize(Tables.events(s, d), key = "user_id",
        timeCol = "ts", idCol = "event_id", gapSeconds = 1800L)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          // Epoch-micros BIGINT bounds: a raw timestamp min/max is
          // render-sensitive when the oracle engine reads the source's
          // TIMESTAMP_NS at a different precision; exact integers aren't.
          unix_micros(min(col("ts"))).as("session_start_us"),
          unix_micros(max(col("ts"))).as("session_end_us"))
        .orderBy(col("user_id"), col("session_id"))
    },

    // §2.4 #44 — the same gap sessions through Spark's native
    // session_window operator (merge-on-overlap session windows; the
    // streaming-capable formulation). window.end = last event + gap
    // by definition — the oracle mirrors that.
    "q60_session_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          unix_micros(col("session_window.end")).as("session_end_plus_gap_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // §2.4 — stream-static join: the replayed event stream enriched
    // against the static customer dimension (broadcast into every
    // micro-batch), aggregated per market segment. Oracle = the same
    // join+agg in batch SQL. max_ts_us pins the TIME AXIS into the
    // compare: in round 7 this query stayed green while every streamed
    // timestamp was 54 years off, because no time-derived column
    // survived the aggregation — now a flavor bug cannot hide.
    "q58_stream_static_join" -> { (s, d) =>
      val static = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val joined = EventStream.readEvents(s, d)
        .join(static, col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"),
          unix_micros(max(col("ts"))).as("max_ts_us"))
      EventStream.runToCompletion(s, joined, "graft_q58")
        .orderBy(col("c_mktsegment"))
    },

    // §2.2 #27 — typed JSON parsing: from_json with an explicit
    // schema → struct column → flattened typed fields (the PanelApp
    // nested-JSON path, but schema-first instead of path-extraction).
    "q63_from_json_typed" -> { (s, d) =>
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType)))
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), schema).as("p"))
        .select(col("event_id"), col("p.k").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    },

    // §2.4 #45 — streaming-dedup semantics in batch: first event per
    // (user, event_type).
    "q45_event_dedup" -> { (s, d) =>
      Temporal.dedupEarliest(Tables.events(s, d),
        keys = Seq("user_id", "event_type"), timeCol = "ts", tieBreak = "event_id")
        .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
        .orderBy(col("user_id"), col("event_type"))
    },

    // §2.4 — stream–stream interval join: purchases joined to the
    // same user's clicks in the preceding 10 minutes, both sides
    // watermarked (the attribution join). Watermark + time-range
    // bound are what let the engine evict join state — the unbounded-
    // state hazard of naive stream joins. Single-batch replay ⇒
    // bit-equal to the batch join oracle.
    "q75_stream_stream_join" -> { (s, d) =>
      // stateful-operator parallelism: each shuffle partition carries
      // TWO state stores (one per join side) with per-batch commit
      // I/O — at this volume 4 partitions beat 32 (fixed store cost
      // dominates; a real cluster sizes this to volume/core count)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val purchases = EventStream.readEvents(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
          .withWatermark("p_ts", "10 minutes")
        val clicks = EventStream.readEvents(s, d)
          .filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
            col("event_id").as("c_id"))
          .withWatermark("c_ts", "10 minutes")
        val joined = purchases.join(clicks,
          col("user_id") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("interval 10 minutes") &&
            col("c_ts") <= col("p_ts"))
          .select(col("user_id"), col("p_id"), col("c_id"))
        EventStream.runToCompletionAppend(s, joined, "graft_q75")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("user_id"))
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    },

    // §2.4 (round 9) — EWMA smoothing + spike detection per series:
    // the metric-monitoring read over events — trailing-20 EWMA with
    // α=1/2 (every weight an exact power of two: no pow() ulp drift
    // between engines) and a relative-residual spike verdict. One
    // shuffle on the series key; O(window) narrow work per row.
    "q163_ewma_anomaly" -> { (s, d) =>
      Temporal.ewmaAnomaly(
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"), col("ts"), col("value")),
        keyCol = "event_type", tsCol = "ts", idCol = "event_id",
        valCol = "value", window = 20)
        .select(col("event_id"), col("event_type"), col("ewma"),
          col("resid"), col("is_spike"))
        .orderBy(col("event_id"))
    },

    // §2.4 (round 9) — interaction-log → training-sequence assembly:
    // each gap session (q44 arithmetic) serializes into one ordered
    // conversation string — "event_type:floor(value)" turns joined in
    // (ts, id) order, truncated to the first 50 turns (context
    // budget), singleton sessions dropped (no training pair). This is
    // the chat-log→SFT-corpus export shape. One (user) shuffle into
    // the session window, then the per-session sorted collapse (the
    // q09 sorted-collect discipline — bounded per session by the
    // truncation cap); all turn text is integer-rendered so the
    // cross-engine string hashes can't drift.
    "q173_dialog_pack" -> { (s, d) =>
      val sess = Temporal.sessionize(Tables.events(s, d), key = "user_id",
        timeCol = "ts", idCol = "event_id", gapSeconds = 1800L)
      sess
        .select(col("user_id"), col("session_id"),
          struct(col("ts"), col("event_id"),
            concat(col("event_type"), lit(":"),
              floor(col("value")).cast("long").cast("string")).as("turn")).as("t"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_turns"),
          concat_ws(" ", transform(
            slice(array_sort(collect_list(col("t"))), 1, 50),
            x => x.getField("turn"))).as("convo"))
        .filter(col("n_turns") >= 2)
        .withColumn("convo_chars", length(col("convo")).cast("long"))
        .orderBy(col("user_id"), col("session_id"))
    }
  )

  private val windowedSql =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q41_windowed_agg" -> windowedSql,
    "q42_stream_windowed" -> windowedSql,

    "q108_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
        |                date_trunc('hour', MAX(ts)) AS h1 FROM events),
        |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |          FROM span),
        |grid AS (SELECT t.event_type, s.hour FROM spine s
        |         CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
        |SELECT g.event_type, g.hour,
        |  COALESCE(h.n_events, 0) AS n_events,
        |  LAST_VALUE(h.sum_value IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_ffill
        |FROM grid g
        |LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hour = g.hour
        |ORDER BY g.event_type, g.hour""".stripMargin,

    // same oracle arithmetic as q51 — the native operator must be
    // result-invisible relative to the composed banded range join
    "q129_interval_native" ->
      """SELECT a.user_id AS user_id, COUNT(*) AS n_close_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
        |GROUP BY a.user_id
        |ORDER BY user_id""".stripMargin,

    "q43b_asof_native" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "q43_asof_join" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "q120_asof_forward" ->
      """SELECT event_id, user_id, next_event_id, gap_us
        |FROM (
        |  SELECT e.event_id, e.user_id, n.event_id AS next_event_id,
        |    epoch_us(n.ts) - epoch_us(e.ts) AS gap_us,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY n.ts ASC, n.event_id ASC) AS rn
        |  FROM events e
        |  JOIN events n ON n.user_id = e.user_id AND n.ts > e.ts
        |    AND epoch_us(n.ts) - epoch_us(e.ts) <= 259200000000)
        |WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "q44_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM x)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       epoch_us(MIN(ts)) AS session_start_us,
        |       epoch_us(MAX(ts)) AS session_end_us
        |FROM y GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q58_stream_static_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  epoch_us(MAX(ts)) AS max_ts_us
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q60_session_window" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
        |       epoch_us(MAX(ts)) + 1800000000 AS session_end_plus_gap_us,
        |       COUNT(*) AS n_events
        |FROM y GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q63_from_json_typed" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |       COUNT(*) AS n
        |FROM events
        |GROUP BY 1
        |ORDER BY k""".stripMargin,

    "q45_event_dedup" ->
      """SELECT user_id, event_type, event_id, ts
        |FROM (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q75_stream_stream_join" ->
      """SELECT p.user_id AS user_id, COUNT(*) AS n_pairs
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 600000000 AND epoch_us(p.ts)
        |GROUP BY 1
        |ORDER BY user_id""".stripMargin,

    // identical α=1/2 trailing-20 EWMA: per-term DECIMAL(18,12)
    // quantization, closed-form geometric denominator (exact in
    // binary on both engines).
    "q163_ewma_anomaly" ->
      """WITH b AS (
        |  SELECT event_id, event_type, value,
        |    list(value) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |                      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS arr
        |  FROM events),
        |c AS (
        |  SELECT event_id, event_type, value, len(arr) AS n,
        |    CAST(list_sum([CAST(arr[i] * pow(0.5, len(arr) - i) AS DECIMAL(18,12))
        |                   for i in generate_series(1, len(arr))]) AS DOUBLE) AS num
        |  FROM b),
        |e AS (
        |  SELECT event_id, event_type, value,
        |    ROUND(num / (2.0 - pow(0.5, CAST(n - 1 AS DOUBLE))), 6) AS ewma
        |  FROM c)
        |SELECT event_id, event_type, ewma,
        |  ROUND(abs(value - ewma), 6) AS resid,
        |  (ROUND(abs(value - ewma), 6) > 0.5 * GREATEST(abs(ewma), 1.0)) AS is_spike
        |FROM e ORDER BY event_id""".stripMargin,

    // same q44 session arithmetic, then the ordered turn collapse
    "q173_dialog_pack" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |y AS (
        |  SELECT user_id, ts, event_id,
        |    event_type || ':' || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS turn,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM x),
        |r AS (
        |  SELECT user_id, session_id, ts, event_id, turn,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, session_id
        |                       ORDER BY ts, event_id) AS rk
        |  FROM y)
        |SELECT user_id, session_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_turns,
        |  string_agg(CASE WHEN rk <= 50 THEN turn END, ' ' ORDER BY ts, event_id)
        |    AS convo,
        |  CAST(length(string_agg(CASE WHEN rk <= 50 THEN turn END, ' '
        |                         ORDER BY ts, event_id)) AS BIGINT) AS convo_chars
        |FROM r GROUP BY user_id, session_id HAVING COUNT(*) >= 2
        |ORDER BY user_id, session_id""".stripMargin
  )
}
