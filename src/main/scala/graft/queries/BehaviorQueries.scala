package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** SURVEY.md §2.4 addendum — event-behavior analytics over the events
  * stream table: ordered funnel stages, cohort retention, and hopping
  * (sliding) windows. These are the product-analytics shapes a user of
  * the reference's event exports runs daily; each is one or two
  * shuffles on uniform keys (user_id / window start) and every output
  * column is integer or decimal-exact, so all three oracle-check.
  */
object BehaviorQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // §2.4 (round 14) — COHORT LTV curves (the lifetime-value report
    // next to retention 45k: not "did the cohort come back" but "what
    // is it WORTH, cumulatively, k weeks in" — the curve subscription
    // and marketplace teams steer spend by). Cohort = the user's
    // first-seen week; per (cohort, week offset): active users,
    // purchase revenue (DECIMAL(18,6)-quantized before the sum — the
    // money discipline), cumulative revenue via a cohort-partitioned
    // window over ≤ |weeks| rows (bounded domain), and LTV per
    // cohort member. Two partial-agg groupBys + one bounded window;
    // the cohort-size frame broadcasts back onto a |cohorts×weeks|
    // dimension table.
    "q261_cohort_ltv" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"),
          (unix_micros(col("ts")) / lit(86400000000L) / lit(7L))
            .cast("long").as("week"))
        .scopedPersist() // consumers: cohort map + the revenue scan
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      val sizes = cohort.groupBy(col("cohort_week"))
        .agg(countDistinct(col("user_id")).as("cohort_size"))
      val cells = ev.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"),
          sum(when(col("event_type") === "purchase",
            round(col("value"), 6).cast(DecimalType(18, 6)))
            .otherwise(expr("CAST(0.0 AS DECIMAL(18,6))"))).as("revenue"))
      cells
        .withColumn("cum_revenue", sum(col("revenue")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("cohort_week")).orderBy(col("week_offset"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
        .join(sizes, "cohort_week")
        .select(col("cohort_week"), col("week_offset"),
          col("n_active"), col("cohort_size"),
          col("revenue").cast("double").as("revenue"),
          col("cum_revenue").cast("double").as("cum_revenue"),
          round(col("cum_revenue").cast("double") / col("cohort_size"), 6)
            .as("ltv_per_user"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // §2.4 (round 14) — FIRST/LAST-TOUCH revenue attribution (the
    // marketing-analytics standard next to the funnel 45j and
    // retention 45k): each purchase's value credits the channel
    // (event_type) of the user's FIRST and LAST non-purchase event in
    // the 2-hour lookback — argmin/argmax over (ts, event_id) structs
    // inside one per-user banded join, no windows. Purchase values
    // quantize to DECIMAL(18,6) via round() BEFORE the per-channel
    // sums (exact, order-free — the money discipline). The join is
    // user-keyed with a time band; per-user event counts are bounded
    // (~67 at sf0.01), the q51-banded-range-join contract; at 100 TB
    // the band would bucket by hour exactly like q51.
    "q256_attribution" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tsm"), col("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("tsm").as("p_tsm"),
          round(col("value"), 6).cast(DecimalType(18, 6)).as("p_val"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_id").as("t_id"),
          col("event_type").as("channel"), col("tsm").as("t_tsm"))
      val attributed = purchases.join(touches, "user_id")
        .filter(col("t_tsm") <= col("p_tsm") &&
          col("t_tsm") > col("p_tsm") - expr("7200000000"))
        .groupBy(col("p_id"), col("p_val"))
        .agg(
          min(struct(col("t_tsm"), col("t_id"), col("channel"))).as("ft"),
          max(struct(col("t_tsm"), col("t_id"), col("channel"))).as("lt"))
        .select(col("p_id"), col("p_val"),
          col("ft")("channel").as("first_ch"),
          col("lt")("channel").as("last_ch"))
      val first = attributed.groupBy(col("first_ch").as("channel"))
        .agg(count(lit(1)).as("n_first"),
          sum(col("p_val")).cast("double").as("val_first"))
      val last = attributed.groupBy(col("last_ch").as("channel"))
        .agg(count(lit(1)).as("n_last"),
          sum(col("p_val")).cast("double").as("val_last"))
      first.join(last, Seq("channel"), "full_outer")
        .select(col("channel"),
          coalesce(col("n_first"), lit(0L)).as("n_first"),
          coalesce(col("val_first"), lit(0.0)).as("val_first"),
          coalesce(col("n_last"), lit(0L)).as("n_last"),
          coalesce(col("val_last"), lit(0.0)).as("val_last"))
        .orderBy(col("channel"))
    },

    // ordered funnel view → click → purchase: each stage's first
    // eligible time must follow the previous stage's. Three bounded
    // aggregates, each a broadcast-sized (≤ n_users rows) join back.
    "q96_funnel" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t_view_us"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("us") > col("t_view_us"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t_click_us"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("us") > col("t_click_us"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t_purchase_us"))
      ev.select(col("user_id")).distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          (when(col("t_view_us").isNotNull, 1).otherwise(0) +
            when(col("t_click_us").isNotNull, 1).otherwise(0) +
            when(col("t_purchase_us").isNotNull, 1).otherwise(0))
            .cast("long").as("funnel_stage"),
          col("t_view_us"), col("t_click_us"), col("t_purchase_us"))
        .orderBy(col("user_id"))
    },

    // weekly cohort retention: users bucketed by first-activity day,
    // counted per whole-week offset of later activity. All-integer
    // day/week arithmetic — no calendar-week engine differences.
    "q97_retention" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          // integer div, never double division: day boundaries exact
          expr("unix_micros(ts) div 86400000000").as("day"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      ev.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_day"),
          expr("(day - cohort_day) div 7").as("week_offset"))
        .groupBy(col("cohort_day"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("week_offset"))
    },

    // hopping windows: 10-minute windows sliding every 5 — each event
    // lands in exactly two windows; sums decimal-exact like q41.
    "q98_sliding_window" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "600 seconds", "300 seconds"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("n_events"), col("sum_value"))
        .orderBy(col("window_start_us"))
    },

    // §2.3 (round 10) — PREFERENCE-PAIR mining (the DPO/RLHF training
    // shape): interaction feedback per (user, day) becomes one
    // (chosen, rejected) pair — top-rated vs bottom-rated response —
    // kept only when the reward margin clears a threshold, so weak
    // signals never become training pairs. ONE partial aggregation
    // (argmax/argmin of (value, id) structs — no windows, no
    // self-join, ties broken by event id on both extremes), then a
    // row-local margin filter. One shuffle on the uniform (user, day)
    // key; at 100 TB this is a map-side-combined groupBy, nothing
    // else.
    "q190_preference_pairs" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"),
          col("event_id"), col("value"))
      ev.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_candidates"),
          max(struct(col("value").as("v"), (-col("event_id")).as("nid")))
            .as("top"),
          min(struct(col("value").as("v"), col("event_id").as("id")))
            .as("bot"))
        .filter(col("n_candidates") >= 2)
        .select(col("user_id"), col("day"), col("n_candidates"),
          (-col("top.nid")).cast("long").as("chosen_event_id"),
          col("top.v").as("chosen_value"),
          col("bot.id").as("rejected_event_id"),
          col("bot.v").as("rejected_value"),
          round(col("top.v") - col("bot.v"), 6).as("margin"))
        .filter(col("margin") >= 50.0)
        .orderBy(col("user_id"), col("day"))
    },

    // §2.3 (round 11) — SFT DIALOG VALIDITY audit: chat-style training
    // data must alternate roles, open with the user, and close with
    // the assistant — malformed dialogs poison instruction tuning.
    // The event log stands in as the turn stream (view/click/signup →
    // user turn, else assistant); per dialog (user_id): turn counts by
    // role, alternation violations (consecutive same-role turns),
    // first/last role, longest same-role run (gaps-and-islands over
    // the per-user window), and the composed validity verdict. All
    // windows are PARTITIONED by user_id — per-dialog state never
    // converges on one task, the 100 TB-safe shape.
    "q194_dialog_audit" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val runs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type").isin("view", "click", "signup"), lit("user"))
            .otherwise(lit("assistant")).as("role"))
        .withColumn("rn", row_number().over(w))
        .withColumn("prev_role", lag(col("role"), 1).over(w))
        .withColumn("run_id",
          sum(when(col("prev_role").isNull ||
            col("prev_role") =!= col("role"), 1L).otherwise(0L)).over(w))
      val maxRun = runs
        .groupBy(col("user_id"), col("run_id"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("user_id")).agg(max(col("run_len")).as("max_run"))
      runs.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_turns"),
          sum(when(col("role") === "user", 1L).otherwise(0L)).as("n_user"),
          sum(when(col("role") === "assistant", 1L).otherwise(0L))
            .as("n_assistant"),
          sum(when(col("prev_role") === col("role"), 1L).otherwise(0L))
            .as("n_violations"),
          max(when(col("rn") === 1, col("role"))).as("first_role"),
          max_by(col("role"), col("rn")).as("last_role"))
        .join(maxRun, "user_id")
        .select(col("user_id"), col("n_turns"), col("n_user"),
          col("n_assistant"), col("n_violations"),
          (col("first_role") === "user").as("starts_user"),
          (col("last_role") === "assistant").as("ends_assistant"),
          col("max_run"),
          (col("n_violations") === 0L && col("first_role") === "user" &&
            col("last_role") === "assistant").as("valid"))
        .orderBy(col("user_id"))
    },

    // §2.3 (round 11) — CHAT-TEMPLATE rendering: the final mile before
    // tokenization — each dialog's ordered turns rendered into the
    // role-tagged template string (<|role|>turn…), with the turn
    // count, rendered length, and a content digest per dialog. The
    // digest makes the rendering itself oracle-checkable without
    // hashing megabyte strings through the driver: both engines must
    // produce the IDENTICAL byte sequence or the md5 splits. One
    // groupBy; ordering inside the aggregate is the deterministic
    // (ts, event_id) sort both engines spell explicitly.
    "q204_chat_template" -> { (s, d) =>
      val t = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"),
          when(col("event_type").isin("view", "click", "signup"),
            lit("user")).otherwise(lit("assistant")).as("role"),
          col("event_type"))
        .select(col("user_id"),
          struct(col("us"), col("event_id"),
            concat(lit("<|"), col("role"), lit("|>"), col("event_type"),
              lit("#"), col("event_id").cast("string")).as("p")).as("s"))
      t.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_turns"),
          array_join(transform(sort_array(collect_list(col("s"))),
            x => x.getField("p")), "").as("rendered"))
        .select(col("user_id"), col("n_turns"),
          length(col("rendered")).cast("long").as("rendered_chars"),
          md5(col("rendered")).as("rendered_md5"))
        .orderBy(col("user_id"))
    },

    // §2.3 (round 13) — first-order MARKOV TRANSITION MATRIX over
    // per-user event streams: the behavioral model behind funnel
    // drop-off prediction (q96), next-action recommendation, and
    // bot-vs-human traffic triage (bots have near-deterministic
    // rows). Per user, consecutive event pairs via lead() over
    // (ts, event_id) — a PARTITIONED window, bounded by per-user
    // history; transition counts + row-normalized probabilities
    // (exact integers to ONE division per cell). The matrix is
    // |event_type|² rows — dimension-sized regardless of corpus.
    "q240_markov_transitions" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("from_type"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy(col("from_type"))
        .agg(sum(col("n")).as("tot"))
      pairs.join(broadcast(totals), "from_type") // |event_type|-row dim
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("tot"), 6).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // §2.3 (round 15) — STATIONARY DISTRIBUTION of the q240 Markov
    // chain by power iteration (π ← πP, 4 rounds from uniform): the
    // long-run share of traffic each event type absorbs — the
    // steady-state read behind capacity planning and the PageRank of
    // the behavioral graph (same machinery: per-round products are
    // IEEE doubles QUANTIZED to DECIMAL(28,14) before the per-state
    // sum, so each round is partition-order-independent and mirrors
    // in unrolled DuckDB CTEs). The matrix is |event_type|² rows —
    // dimension-sized regardless of corpus; the corpus is touched
    // ONCE for the transition counts. States are the UNION of source
    // and destination types: a sink-only type (seen as a destination,
    // never a source) gets a SELF-LOOP row, so every state's outgoing
    // mass is exactly 1 and Σπ is conserved each round — without it,
    // mass absorbed by a sink silently leaks out of the chain at the
    // next join (round-16 fix, oracle mirrored).
    "q313_stationary_dist" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import graft.Caching.ScopedPersist
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type").as("from_type"))
        .withColumn("to_type", lead(col("from_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy(col("from_type"))
        .agg(sum(col("n")).as("tot"))
      val p0 = pairs.join(broadcast(totals), "from_type")
        .select(col("from_type"), col("to_type"),
          expr("CAST(n AS DOUBLE) / tot").as("p"))
        .scopedPersist() // consumers: sink detection + the union
      val sinks = p0.select(col("to_type").as("state")).distinct()
        .join(p0.select(col("from_type").as("state")).distinct(),
          Seq("state"), "left_anti")
      val p = p0.union(sinks.select(col("state").as("from_type"),
        col("state").as("to_type"), lit(1.0).as("p")))
        .scopedPersist() // consumers: state list + 4 iteration joins
      val k = p.select(col("from_type").as("state")).distinct()
      val kn = k.count() // |event_type| — a dimension, not data
      var pi = k.withColumn("pi", lit(1.0 / kn))
      for (_ <- 1 to 4) {
        pi = p.join(pi.withColumnRenamed("state", "from_type"), "from_type")
          .withColumn("term", expr(
            "CAST(ROUND(pi * p, 14) AS DECIMAL(28,14))"))
          .groupBy(col("to_type").as("state"))
          .agg(expr("CAST(SUM(term) AS DOUBLE)").as("pi"))
      }
      pi.select(col("state").as("event_type"),
        round(col("pi"), 6).as("stationary_p"))
        .orderBy(col("event_type"))
    }
  )

  val oracleSql: Map[String, String] = Map(

    "q261_cohort_ltv" ->
      """WITH ev AS (SELECT user_id, event_type, value,
        |    epoch_us(ts) // 86400000000 // 7 AS week FROM events),
        |cohort AS (SELECT user_id, CAST(MIN(week) AS BIGINT) AS cohort_week
        |           FROM ev GROUP BY user_id),
        |sizes AS (SELECT cohort_week,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS cohort_size
        |  FROM cohort GROUP BY cohort_week),
        |cells AS (SELECT c.cohort_week,
        |    CAST(e.week - c.cohort_week AS BIGINT) AS week_offset,
        |    CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active,
        |    SUM(CASE WHEN e.event_type = 'purchase'
        |        THEN CAST(ROUND(e.value, 6) AS DECIMAL(18,6))
        |        ELSE CAST(0.0 AS DECIMAL(18,6)) END) AS revenue
        |  FROM ev e JOIN cohort c ON c.user_id = e.user_id
        |  GROUP BY c.cohort_week, e.week - c.cohort_week),
        |cum AS (SELECT cohort_week, week_offset, n_active, revenue,
        |    SUM(revenue) OVER (PARTITION BY cohort_week ORDER BY week_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_revenue
        |  FROM cells)
        |SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
        |  CAST(c.revenue AS DOUBLE) AS revenue,
        |  CAST(c.cum_revenue AS DOUBLE) AS cum_revenue,
        |  ROUND(CAST(c.cum_revenue AS DOUBLE) / s.cohort_size, 6)
        |    AS ltv_per_user
        |FROM cum c JOIN sizes s ON s.cohort_week = c.cohort_week
        |ORDER BY c.cohort_week, c.week_offset""".stripMargin,

    "q256_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS tsm, value FROM events),
        |p AS (SELECT user_id, event_id AS p_id, tsm AS p_tsm,
        |    CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS p_val
        |  FROM ev WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, event_id AS t_id, event_type AS channel,
        |    tsm AS t_tsm FROM ev WHERE event_type <> 'purchase'),
        |j AS (SELECT p.p_id, p.p_val, t.channel, t.t_tsm, t.t_id
        |  FROM p JOIN t ON p.user_id = t.user_id
        |    AND t.t_tsm <= p.p_tsm AND t.t_tsm > p.p_tsm - 7200000000),
        |att AS (SELECT p_id, p_val,
        |    first(channel ORDER BY t_tsm, t_id) AS first_ch,
        |    first(channel ORDER BY t_tsm DESC, t_id DESC) AS last_ch
        |  FROM j GROUP BY p_id, p_val),
        |f AS (SELECT first_ch AS channel, CAST(COUNT(*) AS BIGINT) AS n_first,
        |    CAST(SUM(p_val) AS DOUBLE) AS val_first
        |  FROM att GROUP BY first_ch),
        |l AS (SELECT last_ch AS channel, CAST(COUNT(*) AS BIGINT) AS n_last,
        |    CAST(SUM(p_val) AS DOUBLE) AS val_last
        |  FROM att GROUP BY last_ch)
        |SELECT COALESCE(f.channel, l.channel) AS channel,
        |  COALESCE(n_first, 0) AS n_first, COALESCE(val_first, 0.0) AS val_first,
        |  COALESCE(n_last, 0) AS n_last, COALESCE(val_last, 0.0) AS val_last
        |FROM f FULL OUTER JOIN l ON f.channel = l.channel
        |ORDER BY channel""".stripMargin,

    "q190_preference_pairs" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_id, value
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
        |), r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, day
        |                       ORDER BY value DESC, event_id) AS rt,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, day
        |                       ORDER BY value ASC, event_id) AS rb,
        |    COUNT(*) OVER (PARTITION BY user_id, day) AS n_candidates
        |  FROM ev)
        |SELECT c.user_id, c.day, CAST(c.n_candidates AS BIGINT) AS n_candidates,
        |  c.event_id AS chosen_event_id, c.value AS chosen_value,
        |  b.event_id AS rejected_event_id, b.value AS rejected_value,
        |  ROUND(c.value - b.value, 6) AS margin
        |FROM (SELECT * FROM r WHERE rt = 1) c
        |JOIN (SELECT * FROM r WHERE rb = 1) b USING (user_id, day, n_candidates)
        |WHERE c.n_candidates >= 2 AND ROUND(c.value - b.value, 6) >= 50.0
        |ORDER BY user_id, day""".stripMargin,

    "q194_dialog_audit" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type IN ('view', 'click', 'signup')
        |         THEN 'user' ELSE 'assistant' END AS role
        |  FROM events),
        |t AS (
        |  SELECT *, row_number() OVER w AS rn, lag(role) OVER w AS prev_role
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT *, SUM(CASE WHEN prev_role IS NULL OR prev_role <> role
        |                     THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run_id
        |  FROM t),
        |mr AS (SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS max_run
        |       FROM (SELECT user_id, run_id, COUNT(*) AS run_len
        |             FROM r GROUP BY 1, 2) GROUP BY user_id),
        |pu AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
        |    CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_user,
        |    CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_assistant,
        |    CAST(SUM(CASE WHEN prev_role = role THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violations,
        |    MAX(CASE WHEN rn = 1 THEN role END) AS first_role,
        |    arg_max(role, rn) AS last_role
        |  FROM r GROUP BY user_id)
        |SELECT pu.user_id, n_turns, n_user, n_assistant, n_violations,
        |  first_role = 'user' AS starts_user,
        |  last_role = 'assistant' AS ends_assistant,
        |  mr.max_run,
        |  n_violations = 0 AND first_role = 'user' AND last_role = 'assistant'
        |    AS valid
        |FROM pu JOIN mr ON mr.user_id = pu.user_id
        |ORDER BY pu.user_id""".stripMargin,

    // '||' kept at end-of-line: a stripMargin line may not START with
    // the concat operator (the margin strips one pipe)
    "q204_chat_template" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CASE WHEN event_type IN ('view', 'click', 'signup')
        |         THEN 'user' ELSE 'assistant' END AS role,
        |    event_type
        |  FROM events),
        |r AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    string_agg('<|' || role || '|>' || event_type || '#' ||
        |      CAST(event_id AS VARCHAR), '' ORDER BY us, event_id) AS rendered
        |  FROM t GROUP BY user_id)
        |SELECT user_id, CAST(n AS BIGINT) AS n_turns,
        |  CAST(length(rendered) AS BIGINT) AS rendered_chars,
        |  md5(rendered) AS rendered_md5
        |FROM r ORDER BY user_id""".stripMargin,

    "q96_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), v AS (
        |  SELECT user_id, MIN(us) AS t_view_us FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT ev.user_id, MIN(us) AS t_click_us FROM ev
        |  JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND us > t_view_us GROUP BY ev.user_id
        |), p AS (
        |  SELECT ev.user_id, MIN(us) AS t_purchase_us FROM ev
        |  JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND us > t_click_us GROUP BY ev.user_id
        |)
        |SELECT u.user_id,
        |  CAST((CASE WHEN t_view_us IS NOT NULL THEN 1 ELSE 0 END) +
        |       (CASE WHEN t_click_us IS NOT NULL THEN 1 ELSE 0 END) +
        |       (CASE WHEN t_purchase_us IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS funnel_stage,
        |  t_view_us, t_click_us, t_purchase_us
        |FROM (SELECT DISTINCT user_id FROM ev) u
        |LEFT JOIN v USING (user_id)
        |LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)
        |ORDER BY u.user_id""".stripMargin,

    "q97_retention" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
        |)
        |SELECT cohort_day, (day - cohort_day) // 7 AS week_offset,
        |       COUNT(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN cohort USING (user_id)
        |GROUP BY cohort_day, week_offset
        |ORDER BY cohort_day, week_offset""".stripMargin,

    "q98_sliding_window" ->
      """WITH us AS (
        |  SELECT epoch_us(ts) AS us, value FROM events
        |), hopped AS (
        |  SELECT (us // 300000000) * 300000000 AS window_start_us, value FROM us
        |  UNION ALL
        |  SELECT (us // 300000000) * 300000000 - 300000000, value FROM us
        |)
        |SELECT window_start_us, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM hopped GROUP BY window_start_us ORDER BY window_start_us""".stripMargin,

    "q240_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |pairs AS (
        |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM seq WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type),
        |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
        |        FROM pairs GROUP BY from_type)
        |SELECT from_type, to_type, n,
        |  ROUND(CAST(n AS DOUBLE) / tot, 6) AS p
        |FROM pairs JOIN tot USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    "q313_stationary_dist" -> {
      val iters = (1 to 4).map { i =>
        s"""i$i AS (SELECT p.to_type AS state,
           |    CAST(SUM(CAST(ROUND(i.pi * p.p, 14) AS DECIMAL(28,14)))
           |      AS DOUBLE) AS pi
           |  FROM p JOIN i${i - 1} i ON i.state = p.from_type
           |  GROUP BY p.to_type)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type, 1) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS to_type
         |  FROM events),
         |pairs AS (
         |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM seq WHERE to_type IS NOT NULL
         |  GROUP BY from_type, to_type),
         |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
         |        FROM pairs GROUP BY from_type),
         |p0 AS (SELECT pairs.from_type, pairs.to_type,
         |    CAST(n AS DOUBLE) / tot AS p
         |  FROM pairs JOIN tot USING (from_type)),
         |sinks AS (SELECT DISTINCT to_type AS state FROM p0
         |  WHERE to_type NOT IN (SELECT from_type FROM p0)),
         |p AS (SELECT from_type, to_type, p FROM p0
         |  UNION ALL SELECT state, state, CAST(1.0 AS DOUBLE) FROM sinks),
         |k AS (SELECT DISTINCT from_type AS state FROM p),
         |i0 AS (SELECT state,
         |  CAST(1.0 AS DOUBLE) / (SELECT COUNT(*) FROM k) AS pi FROM k),
         |$iters
         |SELECT state AS event_type, ROUND(pi, 6) AS stationary_p
         |FROM i4 ORDER BY event_type""".stripMargin
    }
  )
}
