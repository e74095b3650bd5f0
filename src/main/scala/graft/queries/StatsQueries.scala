package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** SURVEY.md §2.3/§2.4 addendum (round 15) — the classical-statistics
  * and lifecycle-analytics layer: survival curves, independence and
  * distribution tests, changepoint detection, customer segmentation,
  * sequence packing for training batches, autocorrelation, Pareto
  * classification, smoothing, and distribution drift.
  *
  * House discipline throughout: every aggregate a statistic derives
  * from is an EXACT integer (counts, cent-quantized money, doubled
  * midranks) or exact decimal, so cross-engine agreement never rests
  * on float summation order; the final statistic evaluates through a
  * textually identical IEEE chain in both engines under round(·,6);
  * every unpartitioned window sits over an aggregate (value-domain /
  * day-domain / cell-domain frames — the PlanAuditSpec bounded rule);
  * multi-consumer frames are scopedPersist-pinned.
  */
object StatsQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // §2.3 (round 15) — KAPLAN–MEIER survival estimator (Kaplan &
    // Meier JASA'58): customer "lifetime" = days between first and
    // last order; a lifetime is an EVENT (churn observed) when the
    // last order predates the 90-day horizon before the dataset's
    // edge, else CENSORED — the right-censoring every retention team
    // faces. Per distinct duration t: at-risk n_t = N − |durations
    // < t| from a duration-domain cumulative window (aggregate
    // beneath — bounded by the day-domain, ~2.4k values), survival
    // S(t) = Π_{t'≤t}(1 − d/n) via exp∘Σ∘ln over the same ordered
    // domain, with the d=n absorbing state handled by an explicit
    // running flag (never ln(0) — DuckDB throws where the JVM returns
    // −Inf). One partial-agg groupBy over orders, then domain-sized
    // frames only.
    "q268_kaplan_meier" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val life = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(min(to_date(col("o_orderdate"))).as("first_d"),
          max(to_date(col("o_orderdate"))).as("last_d"))
        .scopedPersist() // consumers: horizon + the duration rollup
      val hor = life.agg(max(col("last_d")).as("horizon"))
      val byT = life.crossJoin(broadcast(hor))
        .select(datediff(col("last_d"), col("first_d")).as("t"),
          (col("last_d") <= date_sub(col("horizon"), 90))
            .cast("long").as("ev"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("m"), sum(col("ev")).as("dd"))
        .scopedPersist() // consumers: N + the survival frame
      val tot = byT.agg(sum(col("m")).as("nn"))
      val cumW = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val runW = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.crossJoin(broadcast(tot))
        .withColumn("at_risk",
          col("nn") - coalesce(sum(col("m")).over(cumW), lit(0L)))
        .withColumn("lnterm",
          when(col("dd") < col("at_risk"),
            log(lit(1.0) - col("dd").cast("double") / col("at_risk")))
            .otherwise(lit(0.0)))
        .withColumn("dead",
          max((col("dd") === col("at_risk")).cast("int")).over(runW))
        .withColumn("survival",
          when(col("dead") > 0, lit(0.0))
            .otherwise(round(exp(sum(col("lnterm")).over(runW)), 6)))
        .filter(col("dd") > 0)
        .select(col("t").cast("long").as("duration_days"), col("at_risk"),
          col("dd").as("n_events"), (col("m") - col("dd")).as("n_censored"),
          col("survival"))
        .orderBy(col("duration_days"))
    },

    // §2.3 (round 15) — CHI-SQUARE test of INDEPENDENCE over a two-way
    // contingency table (market segment × order priority) — the
    // categorical companion to q254's Welch t and the two-margin
    // generalization of q146's goodness-of-fit-vs-uniform. Observed
    // counts and both margins are exact integers; expected = rt·ct/N
    // through one IEEE division; the statistic accumulates through an
    // ORDERED cell-domain cumulative window (≤ |segs|·|prios| rows,
    // aggregate beneath) so both engines sum the identical term
    // sequence left-to-right — the last row's chi2_cum IS the
    // statistic, dof rides along from the margins.
    "q269_chi2_independence" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val cells = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("prio"))
        .agg(count(lit(1)).as("obs"))
        .scopedPersist() // consumers: two margins + totals + the cells
      val rowm = cells.groupBy(col("seg")).agg(sum(col("obs")).as("rt"))
      val colm = cells.groupBy(col("prio")).agg(sum(col("obs")).as("ct"))
      val tot = cells.agg(sum(col("obs")).as("n"),
        ((countDistinct(col("seg")) - 1)
          * (countDistinct(col("prio")) - 1)).as("dof"))
      val w = Window.orderBy(col("seg"), col("prio"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.join(broadcast(rowm), "seg").join(broadcast(colm), "prio")
        .crossJoin(broadcast(tot))
        .withColumn("ex", (col("rt") * col("ct")).cast("double") / col("n"))
        .withColumn("term", pow(col("obs") - col("ex"), 2.0) / col("ex"))
        .select(col("seg"), col("prio"), col("obs"),
          round(col("ex"), 6).as("expected"),
          round(col("term"), 6).as("chi2_term"),
          round(sum(col("term")).over(w), 6).as("chi2_cum"),
          col("dof"))
        .orderBy(col("seg"), col("prio"))
    },

    // §2.3 (round 15) — SPEARMAN rank correlation per return flag
    // (quantity vs discount): the tie-aware rank transform uses the
    // q260 doubled-midrank identity R2(v) = 2·|{x<v}| + m_v + 1 over
    // each group's BOUNDED value domain (50 quantities × 11 discounts
    // — no corpus row ever sorts), so every rank is an exact integer
    // and all six correlation moments are exact DECIMAL(38,0) sums
    // (the ~4n³ second moments would wrap a Long near n ≈ 1.3·10⁶
    // rows per group — the q281 overflow discipline; oracle mirrored
    // over DuckDB's 128-bit internal sums).
    // ρ = Pearson over the midranks through one identical IEEE chain.
    "q270_spearman" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val vc = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("rf"), col("l_quantity").as("x"),
          col("l_discount").as("y"))
        .agg(count(lit(1)).as("c"))
        .scopedPersist() // consumers: x-domain, y-domain, the moment sums
      def dom(key: String, rank: String): DataFrame = {
        val w = Window.partitionBy(col("rf")).orderBy(col(key))
          .rowsBetween(Window.unboundedPreceding, -1)
        vc.groupBy(col("rf"), col(key)).agg(sum(col("c")).as("m"))
          .withColumn("cb", coalesce(sum(col("m")).over(w), lit(0L)))
          .select(col("rf"), col(key),
            (lit(2L) * col("cb") + col("m") + 1L).as(rank))
      }
      vc.join(dom("x", "rx"), Seq("rf", "x"))
        .join(dom("y", "ry"), Seq("rf", "y"))
        .groupBy(col("rf"))
        .agg(sum(col("c")).as("n"),
          sum(col("c").cast(DecimalType(38, 0)) * col("rx")).as("sx"),
          sum(col("c").cast(DecimalType(38, 0)) * col("ry")).as("sy"),
          sum(col("c").cast(DecimalType(38, 0)) * col("rx") * col("rx"))
            .as("sxx"),
          sum(col("c").cast(DecimalType(38, 0)) * col("ry") * col("ry"))
            .as("syy"),
          sum(col("c").cast(DecimalType(38, 0)) * col("rx") * col("ry"))
            .as("sxy"))
        .select(col("rf").as("l_returnflag"), col("n"),
          round(expr("(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            + " / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            + " * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))"),
            6).as("rho"))
        .orderBy(col("l_returnflag"))
    },

    // §2.3 (round 15) — two-sample KOLMOGOROV–SMIRNOV test per source
    // vs rest over the document-length distribution — the
    // DISTRIBUTION-SHAPE companion to q254 (means) and q260 (ranks):
    // KS sees bimodality and tail shifts both miss. The sup-gap
    // evaluates on the DENSE source × length-domain grid (two
    // aggregates cross-joined, ≤ |sources|·|domain| rows); both ECDFs
    // are exact integer cumulative counts, the gap maximizes as the
    // integer |c_s·n_r − c_r·n_s|, and only the final D and its
    // normal-approx z touch doubles (one division each).
    "q271_ks_test" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val vc = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
        .scopedPersist() // consumers: domain cum + source totals + grid
      val dom = vc.groupBy(col("v")).agg(sum(col("c")).as("m"))
        .withColumn("cum_all", sum(col("m")).over(Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("v"), col("cum_all"))
      val srcs = vc.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
      val nn = srcs.agg(sum(col("n_s")).as("nn"))
      val grid = dom.crossJoin(broadcast(srcs))
        .join(vc, Seq("source", "v"), "left")
        .withColumn("c0", coalesce(col("c"), lit(0L)))
        .withColumn("cum_s", sum(col("c0")).over(
          Window.partitionBy(col("source")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      grid.crossJoin(broadcast(nn))
        .withColumn("gap", abs(col("cum_s") * (col("nn") - col("n_s"))
          - (col("cum_all") - col("cum_s")) * col("n_s")))
        .groupBy(col("source"), col("n_s"), col("nn"))
        .agg(max(col("gap")).as("gmax"))
        .select(col("source"), col("n_s"),
          round(col("gmax").cast("double")
            / (col("n_s") * (col("nn") - col("n_s"))), 6).as("d_stat"),
          round(col("gmax").cast("double")
            / (col("n_s") * (col("nn") - col("n_s")))
            * sqrt(col("n_s").cast("double") * (col("nn") - col("n_s"))
              / col("nn")), 6).as("ks_z"))
        .orderBy(col("source"))
    },

    // §2.4 (round 15) — CUSUM changepoint detection over the daily
    // revenue series (Page, Biometrika'54): the classic recursion
    // S_t = max(0, S_{t-1} + dev_t) rewrites EXACTLY as C_t − min_{j≤t}
    // C_j over the cumulative sum — two ordered windows on the
    // day-domain aggregate, no per-row recursion. Deviations are
    // n-scaled cent integers (n·x_t − Σx, mean-free without a single
    // double), so the whole trace is exact Long arithmetic; only the
    // reported normalized statistic divides (once) into a double. The
    // argmax day — the changepoint estimate — flags by exact integer
    // equality with the full-frame max.
    "q272_cusum" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice"), 2).cast(DecimalType(18, 2)))
          .as("rev"))
        .withColumn("rc", (col("rev") * 100).cast("long"))
        .scopedPersist() // consumers: totals + the deviation frame
      val tot = daily.agg(count(lit(1)).as("nd"), sum(col("rc")).as("trc"))
      val runW = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val allW = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      daily.crossJoin(broadcast(tot))
        .withColumn("dev", col("rc") * col("nd") - col("trc"))
        .withColumn("cum", sum(col("dev")).over(runW))
        .withColumn("s_pos", col("cum") - min(col("cum")).over(runW))
        .withColumn("peak", max(col("s_pos")).over(allW))
        .select(col("day").cast("timestamp").as("day"),
          (col("rc").cast("double") / 100).as("revenue"),
          round(col("s_pos").cast("double") / col("nd") / 100, 6)
            .as("cusum"),
          (col("s_pos") === col("peak")).cast("long").as("is_changepoint"))
        .orderBy(col("day"))
    },

    // §2.3 (round 15) — RFM segmentation (recency / frequency /
    // monetary quintiles — the direct-marketing workhorse since
    // Hughes '94): per-customer stats are one partial-agg groupBy
    // (money cent-quantized to DECIMAL before summing). Customers
    // SCALE WITH FACT VOLUME (150k×SF in TPC-H), so — unlike the
    // genuinely bounded source/event_type domains — the quintile
    // ranks must never ride an unpartitioned window: each of the
    // three total orders (rec DESC / freq / mon, custkey tiebreak —
    // deterministic in both engines) gets its row number from
    // Selection.budgetSelect's DISTRIBUTED two-phase prefix sum
    // (weight 1 ⇒ cum_weight = row_number), and NTILE(5) is then
    // exact integer arithmetic on (rn, n): the first n%5 tiles take
    // ceil(n/5) rows, the rest floor(n/5) — the SQL-standard split,
    // bit-identical to the oracle's NTILE. Output is the 125-cell
    // segment matrix, not the customer list.
    "q273_rfm" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      import graft.operators.Selection
      val cust = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_d"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice"), 2).cast(DecimalType(18, 2)))
            .as("mon"))
        .scopedPersist() // consumers: 1-row globals + 3 rank probes + spine
      // ONE 1-row agg carries both globals (horizon + n); rec itself is
      // never materialized before ranking — datediff(mx, ·) is strictly
      // decreasing in last_d, so the (rec DESC, custkey) total order IS
      // (last_d ASC, custkey), and the recency rank sorts cust directly.
      val glob = cust.agg(max(col("last_d")).as("mx"),
        count(lit(1)).as("nc"))
      // three INDEPENDENT distributed row_numbers, one per RFM total
      // order, joined back on the customer key — SIBLINGS, not nested
      // (nesting re-range-partitioned the full frame per stage and
      // tripled the lineage each budgetSelect's two branches reprint;
      // de-nested, each prefix sum sees only (key, sort col))
      val rn = cust
        .join(Selection.budgetSelect(cust.select(col("o_custkey"), col("last_d")),
          Seq(col("last_d"), col("o_custkey")), lit(1L), Long.MaxValue)
          .select(col("o_custkey"), col("cum_weight").as("rn_r")), "o_custkey")
        .join(Selection.budgetSelect(cust.select(col("o_custkey"), col("freq")),
          Seq(col("freq"), col("o_custkey")), lit(1L), Long.MaxValue)
          .select(col("o_custkey"), col("cum_weight").as("rn_f")), "o_custkey")
        .join(Selection.budgetSelect(cust.select(col("o_custkey"), col("mon")),
          Seq(col("mon"), col("o_custkey")), lit(1L), Long.MaxValue)
          .select(col("o_custkey"), col("cum_weight").as("rn_m")), "o_custkey")
      // SQL NTILE(k): rem = n%k tiles of big = n div 5 + 1 rows first,
      // then tiles of small = n div 5 (n < 5 keeps the first branch)
      def tile(rnCol: String): Column = expr(
        s"CASE WHEN $rnCol <= (nc % 5) * ((nc div 5) + 1)" +
          s" THEN ($rnCol - 1) div ((nc div 5) + 1) + 1" +
          s" ELSE (nc % 5) + ($rnCol - 1 - (nc % 5) * ((nc div 5) + 1))" +
          s" div (nc div 5) + 1 END")
      rn.crossJoin(broadcast(glob))
        .withColumn("rec", datediff(col("mx"), col("last_d")))
        .withColumn("r", tile("rn_r"))
        .withColumn("f", tile("rn_f"))
        .withColumn("m", tile("rn_m"))
        .groupBy(col("r"), col("f"), col("m"))
        .agg(count(lit(1)).as("n_customers"),
          round(avg(col("rec")), 6).as("avg_recency_days"),
          round(sum(col("mon")).cast("double") / count(lit(1)), 6)
            .as("avg_monetary"))
        .orderBy(col("r"), col("f"), col("m"))
    },

    // §2.3 (round 15) — SEQUENCE PACKING audit: GPT-style training
    // batches concatenate the corpus in a fixed document order and
    // split at context-window boundaries (C = 2048 tokens, chars/4
    // heuristic); the packing question is how many documents STRADDLE
    // a boundary (attention-mask fragmentation) and how wide the
    // worst straddle spans. The global token prefix sum rides
    // Selection.budgetSelect's DISTRIBUTED two-phase cumsum over the
    // (doc_id) total order — never a single-task corpus window — and
    // every chunk index is exact integer division off it. Output is
    // the span histogram with the total chunk count.
    "q274_seq_packing" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      import graft.operators.Selection
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          greatest(lit(1L), expr("(n_chars + 3) div 4")).as("tok"))
      val cum = Selection.budgetSelect(
        toks, Seq(col("doc_id")), col("tok"), Long.MaxValue)
        .scopedPersist() // consumers: totals + the span histogram
      val tot = cum.agg(count(lit(1)).as("n_docs_total"),
        sum(col("tok")).as("n_tok"))
      cum
        .withColumn("first_c", expr("(cum_weight - tok) div 2048"))
        .withColumn("last_c", expr("(cum_weight - 1) div 2048"))
        .groupBy((col("last_c") - col("first_c") + 1L).as("span"))
        .agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(tot))
        .select(col("span"), col("n_docs"),
          round(col("n_docs").cast("double") / col("n_docs_total"), 6)
            .as("frac"),
          expr("(n_tok + 2047) div 2048").as("n_chunks"))
        .orderBy(col("span"))
    },

    // §2.4 (round 15) — lag-k AUTOCORRELATION (ACF, lags 1–14) of the
    // daily order-count series — the seasonality fingerprint read
    // before any forecasting model. The series is the day-domain
    // aggregate; deviations are n-scaled integers (n·c_t − Σc), the
    // lag alignment is an equi-join of the day frame against itself
    // shifted through a broadcast 14-row lag spine, and numerator /
    // denominator are exact Long sums (≤ n·(n·c)² ≈ 6·10¹² at sf0.1)
    // meeting in one IEEE division.
    "q275_acf" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val d0 = Tables.orders(s, d)
        .agg(min(to_date(col("o_orderdate"))).as("d0"))
      val daily = Tables.orders(s, d).crossJoin(broadcast(d0))
        .groupBy(datediff(to_date(col("o_orderdate")), col("d0")).as("di"))
        .agg(count(lit(1)).as("c"))
        .scopedPersist() // consumers: totals + denominator + both lag sides
      val tot = daily.agg(count(lit(1)).as("nd"), sum(col("c")).as("tc"))
      val den = daily.crossJoin(broadcast(tot))
        .agg(sum((col("c") * col("nd") - col("tc"))
          * (col("c") * col("nd") - col("tc"))).as("den"))
      val lags = s.range(1, 15).select(col("id").as("lag"))
      daily.crossJoin(broadcast(lags))
        .withColumn("dj", col("di") + col("lag"))
        .join(daily.select(col("di").as("dj"), col("c").as("cy")), "dj")
        .crossJoin(broadcast(tot))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("c") * col("nd") - col("tc"))
            * (col("cy") * col("nd") - col("tc"))).as("num"))
        .crossJoin(broadcast(den))
        .select(col("lag"), col("n_pairs"),
          round(col("num").cast("double") / col("den"), 6).as("acf"))
        .orderBy(col("lag"))
    },

    // §2.4 (round 15) — SEQUENTIAL CONTAINMENT mining over user event
    // streams: for each ordered type pair (a, b), how many users did
    // SOME a before SOME b — the "A leads to B" pattern q240's
    // adjacent-transition Markov matrix cannot see (containment spans
    // arbitrary gaps). Per (user, type) min/max timestamps are one
    // partial-agg groupBy; the pair expansion is a per-user self-join
    // bounded by the type-domain width (≤ 5² rows per user); the
    // verdict min_ts(a) < max_ts(b) is an exact integer compare.
    "q276_seq_containment" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val ut = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(unix_micros(col("ts"))).as("tmin"),
          max(unix_micros(col("ts"))).as("tmax"))
        .scopedPersist() // consumers: both sides of the per-user pair join
      ut.select(col("user_id"), col("event_type").as("type_a"), col("tmin"))
        .join(ut.select(col("user_id"), col("event_type").as("type_b"),
          col("tmax")), Seq("user_id"))
        .filter(col("type_a") =!= col("type_b"))
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_both"),
          sum((col("tmin") < col("tmax")).cast("long")).as("n_seq"))
        .select(col("type_a"), col("type_b"), col("n_both"), col("n_seq"),
          round(col("n_seq").cast("double") / col("n_both"), 6)
            .as("containment"))
        .orderBy(col("type_a"), col("type_b"))
    },

    // §2.3 (round 15) — PARETO / ABC revenue classification of the
    // part catalog: parts ranked by discounted revenue; A = the head
    // covering 80% of revenue, B = the next 15%, C = the tail — the
    // inventory-policy cut every supply chain runs. Revenue is the
    // exact DECIMAL product price·(1−disc) in 10⁻⁴ units (never a
    // double round — the q01 money discipline); the rank-ordered cumulative
    // share rides budgetSelect's distributed prefix sum over the
    // (revenue DESC, partkey) total order (never a single-task part
    // sort); class edges are exact integer compares (cum·100 ≤
    // tot·80), so the A/B/C assignment is float-free.
    "q277_pareto_abc" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      import graft.operators.Selection
      val rev = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))
          * (lit(1).cast(DecimalType(18, 2))
            - col("l_discount").cast(DecimalType(18, 2)))).as("rev"))
        .select(col("l_partkey"), (col("rev") * 10000).cast("long").as("rc"))
      val ranked = Selection.budgetSelect(
        rev, Seq(col("rc").desc, col("l_partkey")), col("rc"), Long.MaxValue)
        .scopedPersist() // consumers: totals + the classified rollup
      val tot = ranked.agg(sum(col("rc")).as("trc"), count(lit(1)).as("np"))
      ranked.crossJoin(broadcast(tot))
        .withColumn("cls",
          when(col("cum_weight") * 100 <= col("trc") * 80, "A")
            .when(col("cum_weight") * 100 <= col("trc") * 95, "B")
            .otherwise("C"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rc")).as("crc"),
          max(col("trc")).as("trc"), max(col("np")).as("np"))
        .select(col("cls"), col("n_parts"),
          round(col("crc").cast("double") / 10000, 2).as("revenue"),
          round(col("crc").cast("double") / col("trc"), 6).as("rev_share"),
          round(col("n_parts").cast("double") / col("np"), 6)
            .as("part_share"))
        .orderBy(col("cls"))
    },

    // §2.4 (round 15) — EWMA smoothing of daily revenue (trailing
    // 7-day geometric half-life): the forecasting primitive under
    // every anomaly band. The infinite EWMA recursion truncates to
    // its 7-term window form with POWER-OF-TWO integer weights
    // (64,32,…,1), so numerator Σ wⱼ·x_{t−j} is an exact cent·weight
    // Long and the denominator adapts to calendar gaps (missing days
    // contribute no weight — no zero-imputation bias). The lag
    // alignment is the q275 broadcast-spine self-join; one IEEE
    // division chain at the end.
    "q278_ewma" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val d0 = Tables.orders(s, d)
        .agg(min(to_date(col("o_orderdate"))).as("d0"))
      val daily = Tables.orders(s, d).crossJoin(broadcast(d0))
        .groupBy(to_date(col("o_orderdate")).as("day"),
          datediff(to_date(col("o_orderdate")), col("d0")).as("di"))
        .agg(sum(round(col("o_totalprice"), 2).cast(DecimalType(18, 2)))
          .as("rev"))
        .withColumn("rc", (col("rev") * 100).cast("long"))
        .scopedPersist() // consumers: anchor side + lag side
      val lags = s.range(0, 7)
        .select(col("id").as("lag"),
          expr("shiftright(64, CAST(id AS INT))").as("w"))
      daily.select(col("day"), col("di"), col("rc"))
        .crossJoin(broadcast(lags))
        .withColumn("dj", col("di") - col("lag"))
        .join(daily.select(col("di").as("dj"), col("rc").as("rcj")), "dj")
        .groupBy(col("day"), col("rc"))
        .agg(sum(col("rcj") * col("w")).as("num"), sum(col("w")).as("den"))
        .select(col("day").cast("timestamp").as("day"),
          (col("rc").cast("double") / 100).as("revenue"),
          round(col("num").cast("double") / col("den") / 100, 6).as("ewma7"))
        .orderBy(col("day"))
    },

    // §2.4 (round 15) — JENSEN–SHANNON divergence of the event-type
    // mix per weekday vs the global mix — the bounded, symmetric
    // drift measure (JSD ∈ [0, ln 2]) run before trusting any
    // day-of-week traffic model; KL alone is infinite on a missing
    // type, JSD is not. Weekday = epoch-day mod 7 in pure integer
    // arithmetic (no timezone/locale dow trap); the term grid is
    // DENSE (weekday totals × global types, so absent cells still
    // contribute their q-side mass); all probabilities are exact
    // integer ratios; the divergence accumulates through a
    // per-weekday ORDERED type-domain window so both engines sum the
    // identical IEEE sequence — the last row per weekday is its JSD.
    "q279_js_divergence" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val wt = Tables.events(s, d)
        .select(expr("(unix_micros(ts) div 86400000000) % 7").as("wd"),
          col("event_type"))
        .groupBy(col("wd"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .scopedPersist() // consumers: weekday totals + type totals + grid
      val wdTot = wt.groupBy(col("wd")).agg(sum(col("c")).as("nw"))
      val gTot = wt.groupBy(col("event_type")).agg(sum(col("c")).as("ct"))
      val nn = gTot.agg(sum(col("ct")).as("n"))
      val w = Window.partitionBy(col("wd")).orderBy(col("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      wdTot.crossJoin(broadcast(gTot))
        .join(wt, Seq("wd", "event_type"), "left")
        .withColumn("c0", coalesce(col("c"), lit(0L)))
        .crossJoin(broadcast(nn))
        .withColumn("p", col("c0").cast("double") / col("nw"))
        .withColumn("q", col("ct").cast("double") / col("n"))
        .withColumn("mm", (col("p") + col("q")) / 2)
        .withColumn("term",
          when(col("p") > 0, col("p") * log(col("p") / col("mm")) / 2)
            .otherwise(lit(0.0))
            + col("q") * log(col("q") / col("mm")) / 2)
        .select(col("wd").as("weekday"), col("event_type"),
          col("c0").as("n_events"),
          round(col("p"), 6).as("p_weekday"),
          round(col("q"), 6).as("p_global"),
          round(sum(col("term")).over(w), 6).as("jsd_cum"))
        .orderBy(col("weekday"), col("event_type"))
    },

    // §2.4 (round 15) — DIFFERENCE-IN-DIFFERENCES estimator (the
    // quasi-experimental workhorse: effect = (treated post − pre) −
    // (control post − pre), differencing out both group baselines and
    // the common time trend). Treatment = user-id parity (the
    // deterministic assignment every holdout splitter uses), post =
    // the second half of the observation window by integer epoch-day
    // midpoint; outcome = purchase value DECIMAL(18,6)-quantized
    // before the four conditional sums — ONE partial-agg pass over
    // events, eight exact cell aggregates, one IEEE chain. No joins,
    // no windows.
    "q280_diff_in_diff" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select((col("user_id") % 2 === 0).cast("int").as("treat"),
          expr("unix_micros(ts) div 86400000000").as("dy"),
          when(col("event_type") === "purchase",
            round(col("value"), 6).cast(DecimalType(18, 6)))
            .otherwise(expr("CAST(NULL AS DECIMAL(18,6))")).as("pv"))
      val mid = ev.agg(expr("(MIN(dy) + MAX(dy)) div 2").as("mid"))
      def cell(t: Int, post: Boolean): org.apache.spark.sql.Column = {
        val m = col("treat") === t &&
          (if (post) col("dy") > col("mid") else col("dy") <= col("mid"))
        m && col("pv").isNotNull
      }
      def mean(t: Int, post: Boolean): org.apache.spark.sql.Column =
        sum(when(cell(t, post), col("pv"))).cast("double") /
          sum(cell(t, post).cast("long"))
      ev.crossJoin(broadcast(mid))
        .agg(
          sum(cell(1, false).cast("long")).as("n_t_pre"),
          sum(cell(1, true).cast("long")).as("n_t_post"),
          sum(cell(0, false).cast("long")).as("n_c_pre"),
          sum(cell(0, true).cast("long")).as("n_c_post"),
          round(mean(1, false), 6).as("mean_t_pre"),
          round(mean(1, true), 6).as("mean_t_post"),
          round(mean(0, false), 6).as("mean_c_pre"),
          round(mean(0, true), 6).as("mean_c_post"),
          round((mean(1, true) - mean(1, false))
            - (mean(0, true) - mean(0, false)), 6).as("did"))
    },

    // §2.4 (round 15) — FORECAST-ERROR evaluation of the seasonal
    // naive baseline ŷ_t = y_{t−7} on daily revenue (the benchmark
    // every forecasting model must beat before it ships; Hyndman's
    // MASE uses exactly this denominator). Errors are exact
    // whole-dollar integers (cents² would overflow a Long at sf0.1 —
    // the 100 TB form is DECIMAL(38)); MAE/RMSE from exact Σ|e|, Σe²;
    // MAPE's per-day ratio terms are doubles, so they accumulate
    // through the day-ordered cumulative window (identical IEEE
    // sequence in both engines) and the LAST day's row is the report.
    "q281_forecast_eval" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val d0 = Tables.orders(s, d)
        .agg(min(to_date(col("o_orderdate"))).as("d0"))
      val daily = Tables.orders(s, d).crossJoin(broadcast(d0))
        .groupBy(datediff(to_date(col("o_orderdate")), col("d0")).as("di"))
        .agg((sum(round(col("o_totalprice"), 2).cast(DecimalType(18, 2)))
          * 100).cast("long").as("rc"))
        .withColumn("rd", expr("rc div 100"))
        .scopedPersist() // consumers: anchor + the 7-day-lag side
      val runW = Window.orderBy(col("di"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val allW = Window.orderBy(col("di"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      daily.select(col("di"), col("rd"))
        .join(daily.select((col("di") + 7).as("di"), col("rd").as("rd7")),
          "di")
        // di is unique, so this re-aggregate is an exact no-op — it
        // exists to keep the downstream unpartitioned windows provably
        // over a day-domain AGGREGATE (the plan-audit bounded rule),
        // which the cached multi-consumer frame would otherwise hide
        .groupBy(col("di"))
        .agg(max(col("rd")).as("rd"), max(col("rd") - col("rd7")).as("e"))
        .withColumn("n", count(lit(1)).over(runW))
        .withColumn("sae", sum(abs(col("e"))).over(runW))
        .withColumn("see", sum(col("e") * col("e")).over(runW))
        .withColumn("cape", sum(abs(col("e")).cast("double") / col("rd"))
          .over(runW))
        .withColumn("mx", max(col("di")).over(allW))
        .filter(col("di") === col("mx"))
        .select(col("n").as("n_days"),
          round(col("sae").cast("double") / col("n"), 6).as("mae"),
          round(sqrt(col("see").cast("double") / col("n")), 6).as("rmse"),
          round(col("cape") / col("n"), 6).as("mape"))
    },

    // §2.4 (round 15) — POISSON DISPERSION test on daily order counts
    // (Fisher's variance-to-mean index: a Poisson arrival process has
    // D = 1; D ≫ 1 flags burstiness/clumping, D ≪ 1 a rate limiter —
    // the first question asked of any event-arrival series): n, Σc,
    // Σc² are exact integers off the day-domain aggregate; D =
    // (n·Σc² − (Σc)²) / ((n−1)·Σc) and the chi-square statistic
    // (n−1)·D evaluate through one identical IEEE chain.
    "q282_dispersion" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_days"), sum(col("c")).as("tc"),
          sum(col("c") * col("c")).as("tcc"))
        .select(col("n_days"),
          round(col("tc").cast("double") / col("n_days"), 6).as("mean"),
          round((col("n_days") * col("tcc") - col("tc") * col("tc"))
            .cast("double")
            / (col("n_days") * (col("n_days") - 1)), 6).as("variance"),
          round((col("n_days") * col("tcc") - col("tc") * col("tc"))
            .cast("double")
            / ((col("n_days") - 1) * col("tc")), 6).as("dispersion"),
          round((col("n_days") * col("tcc") - col("tc") * col("tc"))
            .cast("double") / col("tc"), 6).as("chi2"))
    },

    // §2.4 (round 15) — CROSS-CORRELATION function (CCF, lags −7…+7)
    // between daily order revenue and daily shipment volume — the
    // lead/lag diagnostic behind "does X drive Y and by how many
    // days" (here: shipments trail bookings by the order-to-ship
    // pipeline). Per lag, Pearson over the PAIRED days from exact
    // whole-dollar / count integer moments (Σx, Σy, Σxy, Σx², Σy², n
    // — all Long-safe at sf0.1, DECIMAL(38) at 100 TB); alignment is
    // an equi-join against the broadcast 15-row lag spine.
    "q283_cross_correlation" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val d0 = Tables.orders(s, d)
        .agg(min(to_date(col("o_orderdate"))).as("d0"))
        .scopedPersist() // consumers: the revenue and shipment spines
      val x = Tables.orders(s, d).crossJoin(broadcast(d0))
        .groupBy(datediff(to_date(col("o_orderdate")), col("d0")).as("di"))
        .agg(expr("(CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)))"
          + " * 100 AS BIGINT)) div 100").as("x"))
      val y = Tables.lineitem(s, d).crossJoin(broadcast(d0))
        .groupBy(datediff(to_date(col("l_shipdate")), col("d0")).as("dj"))
        .agg(count(lit(1)).as("y"))
      val lags = s.range(-7, 8).select(col("id").as("lag"))
      x.crossJoin(broadcast(lags))
        .withColumn("dj", col("di") + col("lag"))
        .join(y, "dj")
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("lag"), col("n_pairs"),
          round(expr("(CAST(n_pairs AS DOUBLE) * sxy"
            + " - CAST(sx AS DOUBLE) * sy)"
            + " / (sqrt(CAST(n_pairs AS DOUBLE) * sxx"
            + " - CAST(sx AS DOUBLE) * sx)"
            + " * sqrt(CAST(n_pairs AS DOUBLE) * syy"
            + " - CAST(sy AS DOUBLE) * sy))"), 6).as("ccf"))
        .orderBy(col("lag"))
    },

    // §2.3 (round 15) — 10% TRIMMED MEAN of document length per
    // source (the robust location estimate q127's winsorized stats
    // sit next to: winsorizing CLAMPS the tails, trimming DROPS
    // them). Trim bounds are exact integer ranks (lo = n/10, hi =
    // n − lo); each domain value contributes its RANK-INTERVAL
    // OVERLAP max(0, min(cum, hi) − max(cum − m, lo)) — pure integer
    // clipping off the per-source value-domain cumulative window, so
    // the trimmed sum is exact and no document row ever sorts.
    "q284_trimmed_mean" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val vc = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("m"))
        .withColumn("cum", sum(col("m")).over(
          Window.partitionBy(col("source")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .scopedPersist() // consumers: per-source totals + the clip
      val tot = vc.groupBy(col("source")).agg(max(col("cum")).as("n_s"))
      vc.join(broadcast(tot), "source")
        .withColumn("lo", expr("n_s div 10"))
        .withColumn("hi", col("n_s") - col("lo"))
        .withColumn("kept", greatest(lit(0L),
          least(col("cum"), col("hi"))
            - greatest(col("cum") - col("m"), col("lo"))))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_docs"),
          sum(col("v") * col("m")).as("sv"),
          sum(col("v") * col("kept")).as("svt"),
          max(col("hi") - col("lo")).as("nt"))
        .select(col("source"), col("n_docs"),
          round(col("sv").cast("double") / col("n_docs"), 6).as("mean"),
          round(col("svt").cast("double") / col("nt"), 6)
            .as("trimmed_mean"))
        .orderBy(col("source"))
    },

    // §2.3 (round 15) — MEDIAN ABSOLUTE DEVIATION per source (the
    // robust scale estimate paired with q284's robust location; the
    // outlier fence medians ± k·MAD every profiler draws). BOTH
    // medians are nearest-rank picks off value-domain cumulative
    // windows — the n_chars domain for the median, then the |v−med|
    // DEVIATION domain (no bigger) for the MAD — so the whole
    // statistic is exact integer arithmetic end to end: no doubles,
    // no interpolation, nothing to round.
    "q285_mad" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val vc = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("m"))
        .withColumn("cum", sum(col("m")).over(
          Window.partitionBy(col("source")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .scopedPersist() // consumers: totals + median pick + dev domain
      val tot = vc.groupBy(col("source")).agg(max(col("cum")).as("n_s"))
      val med = vc.join(broadcast(tot), "source")
        .filter(col("cum") * 2 >= col("n_s"))
        .groupBy(col("source"))
        .agg(min(col("v")).as("median"), max(col("n_s")).as("n_s"))
      vc.join(broadcast(med), "source")
        .groupBy(col("source"), abs(col("v") - col("median")).as("dev"))
        .agg(sum(col("m")).as("dm"),
          max(col("median")).as("median"), max(col("n_s")).as("n_s"))
        .withColumn("cumd", sum(col("dm")).over(
          Window.partitionBy(col("source")).orderBy(col("dev"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cumd") * 2 >= col("n_s"))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_docs"), max(col("median")).as("median"),
          min(col("dev")).as("mad"))
        .orderBy(col("source"))
    },

    // §2.4 (round 15) — CUMULATIVE UNIQUES / new-vs-returning daily
    // report (the DAU growth chart: actives split into first-ever-seen
    // and returning, plus the running total of distinct users to
    // date). Running exact distinct normally re-scans every prefix;
    // here it collapses to FIRST-SEEN day per user (one partial-agg
    // groupBy) + a day-domain cumulative window — each user counted
    // once, forever, at their debut. Both frames are day-domain
    // aggregates; the raw projection is deliberately NOT persisted
    // (two column-pruned scans beat caching the corpus at 100 TB).
    "q286_cumulative_uniques" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(expr("unix_micros(ts) div 86400000000").as("dy"),
          col("user_id"))
      val da = ev.groupBy(col("dy"))
        .agg(countDistinct(col("user_id")).as("active_users"))
      val nu = ev.groupBy(col("user_id")).agg(min(col("dy")).as("dy"))
        .groupBy(col("dy")).agg(count(lit(1)).as("new_users"))
      val w = Window.orderBy(col("dy"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      da.join(nu, Seq("dy"), "left")
        .withColumn("nu0", coalesce(col("new_users"), lit(0L)))
        .withColumn("cum_users", sum(col("nu0")).over(w))
        .select(col("dy").as("day"), col("active_users"),
          col("nu0").as("new_users"),
          (col("active_users") - col("nu0")).as("returning_users"),
          col("cum_users"))
        .orderBy(col("day"))
    },

    // §2.3 (round 15) — FILL-IN-THE-MIDDLE split planning (Bavarian
    // et al.'22, arXiv:2207.14255 — the FIM transform behind every
    // code model's infilling ability: doc → (prefix, middle, suffix),
    // train on [pre][suf][mid]): two cut points per document from
    // SEEDED 48-bit md5 uniforms scaled by EXACT integer arithmetic
    // (h·T div 2^48 — no float in the cut), so the plan is
    // deterministic, hash-oracle-able, and reproducible across reruns
    // — the property a training pipeline needs to regenerate the same
    // split for the same doc (a production run swaps the seeded hash
    // for a seeded PRNG; plan shape unchanged). Per-source audit:
    // split-mass fractions (≈ uniform-order-statistics thirds) and
    // the empty-middle degenerate count. ONE narrow scan + one
    // source-domain groupBy.
    "q287_fim_plan" -> { (s, d) =>
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          greatest(lit(1L), expr("(n_chars + 3) div 4")).as("t"))
        .withColumn("h1", conv(substring(
          md5(concat(lit("q287:a:"), col("doc_id"))), 1, 12), 16, 10)
          .cast("long"))
        .withColumn("h2", conv(substring(
          md5(concat(lit("q287:b:"), col("doc_id"))), 1, 12), 16, 10)
          .cast("long"))
        .withColumn("c1", expr("(h1 * t) div 281474976710656"))
        .withColumn("c2", expr("(h2 * t) div 281474976710656"))
        .withColumn("lo", least(col("c1"), col("c2")))
        .withColumn("hi", greatest(col("c1"), col("c2")))
      base.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("t")).as("sum_tokens"),
          sum(col("lo")).as("sp"),
          sum(col("hi") - col("lo")).as("sm"),
          sum(col("t") - col("hi")).as("ss"),
          sum((col("hi") === col("lo")).cast("long")).as("n_empty_middle"))
        .select(col("source"), col("n_docs"), col("sum_tokens"),
          round(col("sp").cast("double") / col("sum_tokens"), 6)
            .as("prefix_frac"),
          round(col("sm").cast("double") / col("sum_tokens"), 6)
            .as("middle_frac"),
          round(col("ss").cast("double") / col("sum_tokens"), 6)
            .as("suffix_frac"),
          col("n_empty_middle"))
        .orderBy(col("source"))
    },

    // §2.4 (round 15) — multiplicative SEASONAL INDICES by weekday
    // (the seasonal step of classical decomposition, and the
    // normalizer behind every day-of-week-adjusted KPI): index_w =
    // weekday-mean / grand-mean = sum_w·N / (n_w·T), exact cent
    // integers meeting in one IEEE chain. Weekday is epoch-day mod 7
    // (pure integer arithmetic, the q279 no-locale rule); the whole
    // report is a 7-row weekday-domain rollup of the day-domain
    // aggregate.
    "q288_seasonal_index" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg((sum(round(col("o_totalprice"), 2).cast(DecimalType(18, 2)))
          * 100).cast("long").as("rc"))
        .withColumn("wd",
          expr("datediff(day, DATE '1970-01-01') % 7"))
        .scopedPersist() // consumers: grand totals + weekday rollup
      val tot = daily.agg(count(lit(1)).as("nn"), sum(col("rc")).as("tt"))
      daily.groupBy(col("wd"))
        .agg(count(lit(1)).as("n_days"), sum(col("rc")).as("sw"))
        .crossJoin(broadcast(tot))
        .select(col("wd").cast("long").as("weekday"), col("n_days"),
          round(col("sw").cast("double") / col("n_days") / 100, 6)
            .as("avg_revenue"),
          round((col("sw") * col("nn")).cast("double")
            / (col("n_days") * col("tt")), 6).as("seasonal_index"))
        .orderBy(col("weekday"))
    },

    // §2.4 (round 15) — TOP ENTRY PATHS: each user's first three
    // event types in (ts, id) order collapse to one "a>b>c" path
    // string; the report is the top-20 paths by user count — the
    // onboarding-funnel discovery read (45j's funnel CHECKS a known
    // path; this FINDS the paths). Rank-3 prefix via a per-user
    // partitioned window (never global); the ordered collapse is the
    // q173 sorted-array discipline so the path string cannot drift
    // with shuffle order; top-20 is a TakeOrdered with a full
    // (count DESC, path) tiebreak.
    "q289_top_paths" -> { (s, d) =>
      val firstN = Tables.events(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(unix_micros(col("ts")), col("event_id"))))
        .filter(col("rn") <= 3)
      firstN
        .groupBy(col("user_id"))
        .agg(array_join(array_sort(collect_list(struct(col("rn"),
          col("event_type")))).getField("event_type"), ">").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    },

    // §2.4 (round 15) — BOT-TRAFFIC heuristics rollup: per user, the
    // three classic machine signals — burst rate (max events in any
    // one minute), minimum inter-event gap (sub-second repeats), and
    // type diversity — each an exact integer off one per-user
    // partitioned pass; verdict thresholds are integer compares. The
    // report aggregates to the verdict matrix (the triage dashboard),
    // never shipping per-user rows off the cluster.
    "q290_bot_score" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tsm"))
        .scopedPersist() // consumers: per-minute bursts + gap scan
      val burst = ev
        .groupBy(col("user_id"), expr("tsm div 60000000").as("minute"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("user_id"))
        .agg(max(col("c")).as("max_per_min"))
      val gaps = ev
        .withColumn("prev", lag(col("tsm"), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("tsm"), col("event_id"))))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          min(when(col("prev").isNotNull, col("tsm") - col("prev")))
            .as("min_gap_us"))
      gaps.join(burst, "user_id")
        .withColumn("verdict",
          when(col("max_per_min") >= 5 ||
            (col("min_gap_us").isNotNull && col("min_gap_us") < 1000000L),
            "bot_like").otherwise("human_like"))
        .groupBy(col("verdict"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("n_events")).as("total_events"),
          round(sum(col("n_events")).cast("double") / count(lit(1)), 6)
            .as("avg_events"),
          round(sum(col("n_types")).cast("double") / count(lit(1)), 6)
            .as("avg_types"))
        .orderBy(col("verdict"))
    },

    // §2.3 (round 15) — ORDER-FULFILLMENT LAG quantiles per priority
    // (ship date − order date; the SLA report): the lag domain is
    // bounded (≤ ~4 months of days), so p50/p90/p99 are EXACT
    // nearest-rank picks off the per-priority lag-domain cumulative
    // window — the q53/q127/q285 exact-quantile discipline, never a
    // row-level sort. 100·cum ≥ q·n keeps every rank edge an integer
    // compare.
    "q291_fulfillment_lag" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val vc = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("prio"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .as("lag"))
        .agg(count(lit(1)).as("m"))
        .withColumn("cum", sum(col("m")).over(
          Window.partitionBy(col("prio")).orderBy(col("lag"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .scopedPersist() // consumers: totals + three rank picks
      val tot = vc.groupBy(col("prio")).agg(max(col("cum")).as("n"))
      vc.join(broadcast(tot), "prio")
        .groupBy(col("prio"))
        .agg(max(col("n")).as("n_lineitems"),
          min(when(col("cum") * 100 >= col("n") * 50, col("lag")))
            .cast("long").as("p50"),
          min(when(col("cum") * 100 >= col("n") * 90, col("lag")))
            .cast("long").as("p90"),
          min(when(col("cum") * 100 >= col("n") * 99, col("lag")))
            .cast("long").as("p99"),
          max(col("lag")).cast("long").as("max_lag"))
        .orderBy(col("prio"))
    },

    // §2.4 (round 15) — LASPEYRES PRICE INDEX by month (the
    // fixed-basket inflation measure: I_m = Σ p_m·q₀ / Σ p₀·q₀ over
    // the base month's basket — the econ-analytics read over any
    // priced fact table). Unit prices are exact rationals
    // (cent-revenue / integer quantity per (month, part)); the
    // basket sums are double terms, so they accumulate through
    // per-month PART-ORDERED cumulative windows (the part catalog is
    // a bounded dimension — the CurationQueries 696/800 window
    // precedent) and the last part's row per month carries the index
    // — both engines sum the identical IEEE sequence.
    "q292_price_index" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val mp = Tables.lineitem(s, d)
        .groupBy((year(to_date(col("l_shipdate"))) * 100
          + month(to_date(col("l_shipdate")))).as("ym"),
          col("l_partkey").as("pk"))
        .agg((sum(round(col("l_extendedprice"), 2)
          .cast(DecimalType(18, 2))) * 100).cast("long").as("e"),
          sum(col("l_quantity")).cast("long").as("q"))
        .scopedPersist() // consumers: base-month basket + every month
      val base = mp.agg(min(col("ym")).as("ym0"))
      val basket = mp.join(broadcast(base), col("ym") === col("ym0"))
        .select(col("pk"), col("e").as("e0"), col("q").as("q0"))
      val joined = mp.join(basket, "pk")
        .withColumn("num", col("e").cast("double") / col("q") * col("q0"))
        .withColumn("den", col("e0").cast("double") / col("q0") * col("q0"))
      val w = Window.partitionBy(col("ym")).orderBy(col("pk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joined
        .withColumn("cnum", sum(col("num")).over(w))
        .withColumn("cden", sum(col("den")).over(w))
        .withColumn("np", count(lit(1)).over(
          Window.partitionBy(col("ym"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("ym")).orderBy(col("pk").desc)))
        .filter(col("rn") === 1)
        .select(col("ym").cast("long").as("month"),
          col("np").as("n_parts"),
          round(col("cnum") / col("cden"), 6).as("laspeyres_index"))
        .orderBy(col("month"))
    },

    // §2.3 (round 15) — DECISION-TREE SPLIT SCORING (information
    // gain): for each candidate categorical feature, H(label) −
    // Σ_v (n_v/N)·H(label|v) — the ID3/C4.5 split finder and the
    // feature-importance read run before training anything. Every
    // count is an exact integer; every entropy is a sum of ≤
    // |domain| ln-terms accumulated through ORDERED domain windows
    // (value, label) so both engines walk the identical IEEE
    // sequence; the long (feature, value, label) layout scores ALL
    // features in one aggregation pipeline instead of one query per
    // feature.
    "q293_split_gain" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderstatus").as("label"),
          col("c_mktsegment").as("segment"),
          col("o_orderpriority").as("priority"))
        .scopedPersist() // consumers: both union branches
      val long = base.select(lit("segment").as("f"),
        col("segment").as("v"), col("label"))
        .unionByName(base.select(lit("priority").as("f"),
          col("priority").as("v"), col("label")))
      val nvl = long.groupBy(col("f"), col("v"), col("label"))
        .agg(count(lit(1)).as("c"))
        .scopedPersist() // consumers: value totals + label marginals + terms
      val nv = nvl.groupBy(col("f"), col("v")).agg(sum(col("c")).as("nv"))
      val nl = nvl.filter(col("f") === "segment")
        .groupBy(col("label")).agg(sum(col("c")).as("cl"))
      val nn = nl.agg(sum(col("cl")).as("n"))
      // H(label): ordered label-domain accumulation, last row = total
      val wl = Window.orderBy(col("label"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hBefore = nl.crossJoin(broadcast(nn))
        .withColumn("t", (col("cl").cast("double") / col("n"))
          * log(col("cl").cast("double") / col("n")))
        .withColumn("ct", sum(col("t")).over(wl))
        .withColumn("rn0", row_number().over(
          Window.orderBy(col("label").desc)))
        .filter(col("rn0") === 1)
        .select((-col("ct")).as("h_lbl"))
      // per-(f,v) conditional entropy via ordered (label) window
      val wv = Window.partitionBy(col("f"), col("v"))
        .orderBy(col("label"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val hv = nvl.join(nv, Seq("f", "v"))
        .withColumn("t", (col("c").cast("double") / col("nv"))
          * log(col("c").cast("double") / col("nv")))
        .withColumn("ct", sum(col("t")).over(wv))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("f"), col("v"))
            .orderBy(col("label").desc)))
        .filter(col("rn") === 1)
        .select(col("f"), col("v"), col("nv"), (-col("ct")).as("hv"))
      // weighted roll-up per feature via ordered (value) window
      val wf = Window.partitionBy(col("f")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hv.crossJoin(broadcast(nn))
        .withColumn("wt", (col("nv").cast("double") / col("n")) * col("hv"))
        .withColumn("cwt", sum(col("wt")).over(wf))
        .withColumn("rn2", row_number().over(
          Window.partitionBy(col("f")).orderBy(col("v").desc)))
        .filter(col("rn2") === 1)
        .crossJoin(broadcast(hBefore))
        .select(col("f").as("feature"),
          round(col("h_lbl"), 6).as("h_label"),
          round(col("cwt"), 6).as("h_conditional"),
          round(col("h_lbl") - col("cwt"), 6).as("info_gain"))
        .orderBy(col("feature"))
    },

    // §2.3 (round 15) — POINT-IN-TIME feature snapshot + churn label
    // (the leakage-safe training-set constructor: features from
    // STRICTLY before the cutoff, the label from the 90 days after —
    // the temporal firewall every churn model needs and naive
    // "max-date features" silently violate). Cutoff = dataset edge −
    // 180d from a 1-row broadcast; features are one pre-cutoff
    // partial-agg pass (counts, DECIMAL-quantized spend, recency);
    // the label is an anti-joinable post-window flag folded in the
    // same orders scan via conditional aggregation — ONE shuffle on
    // custkey, no window, no self-join.
    "q294_feature_snapshot" -> { (s, d) =>
      val edge = Tables.orders(s, d)
        .agg(max(to_date(col("o_orderdate"))).as("mx"))
      val cust = Tables.orders(s, d).crossJoin(broadcast(edge))
        .withColumn("day", to_date(col("o_orderdate")))
        .withColumn("cutoff", date_sub(col("mx"), 180))
        .groupBy(col("o_custkey"))
        .agg(
          sum((col("day") < col("cutoff")).cast("long")).as("past_orders"),
          sum(when(col("day") < col("cutoff"),
            round(col("o_totalprice"), 2).cast(DecimalType(18, 2)))
            .otherwise(expr("CAST(0 AS DECIMAL(18,2))"))).as("past_spend"),
          max(when(col("day") < col("cutoff"), col("day"))).as("last_d"),
          max(col("cutoff")).as("cutoff"),
          sum((col("day") >= col("cutoff")
            && col("day") < date_add(col("cutoff"), 90)).cast("long"))
            .as("post_orders"))
        .filter(col("past_orders") > 0)
      cust
        .withColumn("label",
          when(col("post_orders") > 0, "retained").otherwise("churned"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("past_orders")).cast("double") / count(lit(1)), 6)
            .as("avg_past_orders"),
          round(sum(col("past_spend")).cast("double") / count(lit(1)), 6)
            .as("avg_past_spend"),
          round(sum(datediff(col("cutoff"), col("last_d")))
            .cast("double") / count(lit(1)), 6).as("avg_recency_days"))
        .orderBy(col("label"))
    },

    // §2.3 (round 15) — VOCABULARY COVERAGE CURVE: the OOV rate at
    // candidate vocab sizes 250 / 1k / 4k (the tokenizer-budget
    // sizing read that precedes any BPE/Unigram training run — q126
    // audits ONE vocabulary, this sweeps the size axis). Word ranks
    // come from budgetSelect's DISTRIBUTED prefix sum over the
    // (count DESC, word) total order with weight 1 — rank = cum_weight,
    // no single-task vocabulary sort — and each OOV mass is one exact
    // conditional integer sum.
    "q295_vocab_curve" -> { (s, d) =>
      import graft.operators.Selection
      import graft.functions.GraftFunctions
      val vc = Tables.documents(s, d)
        .select(explode(GraftFunctions.normWords(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("c"))
      val ranked = Selection.budgetSelect(vc,
        Seq(col("c").desc, col("word")), lit(1L), Long.MaxValue)
      ranked.agg(sum(col("c")).as("total_tokens"),
        count(lit(1)).as("vocab_size"),
        sum(when(col("cum_weight") > 250, col("c"))
          .otherwise(lit(0L))).as("o250"),
        sum(when(col("cum_weight") > 1000, col("c"))
          .otherwise(lit(0L))).as("o1000"),
        sum(when(col("cum_weight") > 4000, col("c"))
          .otherwise(lit(0L))).as("o4000"))
        .select(col("total_tokens"), col("vocab_size"),
          round(col("o250").cast("double") / col("total_tokens"), 6)
            .as("oov_250"),
          round(col("o1000").cast("double") / col("total_tokens"), 6)
            .as("oov_1000"),
          round(col("o4000").cast("double") / col("total_tokens"), 6)
            .as("oov_4000"))
    },

    // §2.3 (round 15) — UL2 MIXTURE-OF-DENOISERS planning (Tay et
    // al.'22, arXiv:2205.05131 — the R/S/X denoiser mix behind UL2 /
    // PaLM-2 pretraining; 40fb's FIM is the S-denoiser's code
    // cousin): each doc draws its denoiser from a seeded 48-bit md5
    // mod 3 (R: 15% noise in span-3 chunks, S: prefix-LM masking the
    // last quarter, X: extreme 50% in span-32 chunks); every span
    // count and mask size is pure integer arithmetic off the chars/4
    // token count, so the whole plan is deterministic and
    // hash-oracle-able. Per (source, denoiser): docs, token mass,
    // mask fraction, mean spans. ONE narrow scan + one bounded
    // groupBy.
    "q296_ul2_mix" -> { (s, d) =>
      val base = Tables.documents(s, d)
        .select(col("source"),
          greatest(lit(1L), expr("(n_chars + 3) div 4")).as("t"),
          (conv(substring(md5(concat(lit("q296:"), col("doc_id"))),
            1, 12), 16, 10).cast("long") % 3).as("dz"))
        .withColumn("denoiser",
          when(col("dz") === 0, "R").when(col("dz") === 1, "S")
            .otherwise("X"))
        .withColumn("n_spans",
          when(col("dz") === 0, greatest(lit(1L), expr("t div 20")))
            .when(col("dz") === 1, lit(1L))
            .otherwise(greatest(lit(1L), expr("t div 64"))))
        .withColumn("masked",
          when(col("dz") === 0,
            least(col("t") - 1, col("n_spans") * 3))
            .when(col("dz") === 1, greatest(lit(1L), expr("t div 4")))
            .otherwise(least(col("t") - 1, col("n_spans") * 32)))
      base.groupBy(col("source"), col("denoiser"))
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("sum_tokens"),
          sum(col("masked")).as("sum_masked"),
          sum(col("n_spans")).as("sum_spans"))
        .select(col("source"), col("denoiser"), col("n_docs"),
          col("sum_tokens"),
          round(col("sum_masked").cast("double") / col("sum_tokens"), 6)
            .as("mask_frac"),
          round(col("sum_spans").cast("double") / col("n_docs"), 6)
            .as("avg_spans"))
        .orderBy(col("source"), col("denoiser"))
    },

    // §2.3 (round 15) — DELETE-ONE-GROUP JACKKNIFE (Quenouille/Tukey;
    // the delete-a-group variant every A/B platform uses to put an
    // SE on a RATIO metric, where the naive per-row variance is
    // biased): θ = mean order value; leave each nation's customers
    // out, θ₍ᵢ₎ from the 1-row totals by subtraction (the q251/q254
    // LOO identity — no second scan), pseudo-values g·θ̂ − (g−1)·θ₍ᵢ₎,
    // SE = √((g−1)/g · Σ(θ₍ᵢ₎−θ̄)²). Numerators are exact cents;
    // θ₍ᵢ₎ and the squared deviations are IEEE doubles QUANTIZED to
    // decimals before their bounded (g=25) sums, so the estimate is
    // partition-order-independent. ONE groupBy + three 1-row
    // broadcasts.
    "q299_jackknife" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val per = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("nk"))
        .agg(count(lit(1)).as("n_g"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents_g"))
      val tot = per.agg(sum(col("n_g")).as("nn"), sum(col("cents_g")).as("cc"),
        count(lit(1)).as("g"))
      val loo = per.crossJoin(broadcast(tot))
        .withColumn("th_loo",
          expr("CAST(cc - cents_g AS DOUBLE) / (nn - n_g)"))
        .withColumn("th_dec",
          expr("CAST(ROUND(th_loo, 10) AS DECIMAL(28,10))"))
        .scopedPersist() // consumers: mean pass, deviation pass, output
      val m1 = loo.agg(sum(col("th_dec")).as("s1"))
      val dev = loo.crossJoin(broadcast(m1))
        .withColumn("dv", expr(
          "CAST(ROUND(pow(CAST(th_dec AS DOUBLE) - CAST(s1 AS DOUBLE) / g," +
            " 2.0), 10) AS DECIMAL(28,10))"))
      val ssq = dev.agg(sum(col("dv")).as("ssq"))
      loo.crossJoin(broadcast(m1)).crossJoin(broadcast(ssq))
        .select(col("nk"), col("n_g").as("n_orders"),
          round(col("th_loo"), 6).as("theta_loo"),
          expr("ROUND(g * (CAST(cc AS DOUBLE) / nn)" +
            " - (g - 1) * th_loo, 6)").as("pseudo_value"),
          expr("ROUND(CAST(cc AS DOUBLE) / nn, 6)").as("theta_hat"),
          expr("ROUND(CAST(s1 AS DOUBLE) / g, 6)").as("jack_mean"),
          expr("ROUND(sqrt(CAST(g - 1 AS DOUBLE) / g" +
            " * CAST(ssq AS DOUBLE)), 6)").as("jack_se"))
        .orderBy(col("nk"))
    },

    // §2.3 (round 15) — THEIL T INEQUALITY INDEX with within/between
    // decomposition (Theil '67; the inequality read that — unlike
    // Gini q223 — decomposes EXACTLY into a within-group plus a
    // between-group term): over positive account balances by nation,
    // T = (1/N)Σ(x/μ)ln(x/μ), T_g per nation, share s_g = Σx_g/Σx
    // (exact cents!), between_g = s_g·ln(μ_g/μ), within_g = s_g·T_g.
    // Per-element ln-terms are doubles QUANTIZED to DECIMAL(28,12)
    // before the group/global sums (the pageRank discipline), so
    // every statistic is partition-order-independent; the spec
    // asserts T ≈ Σwithin + Σbetween to quantization precision.
    "q300_theil" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val x = Tables.customer(s, d)
        .select(col("c_nationkey").cast("long").as("nk"),
          round(col("c_acctbal") * 100, 0).cast("long").as("x"))
        .filter(col("x") > 0)
      val per = x.groupBy(col("nk"))
        .agg(count(lit(1)).as("n_g"), sum(col("x")).as("sx_g"))
      val tot = per.agg(sum(col("n_g")).as("nn"), sum(col("sx_g")).as("sx"))
      val rows = x
        .join(per.withColumn("mu_g", expr("CAST(sx_g AS DOUBLE) / n_g")), "nk")
        .crossJoin(broadcast(tot.withColumn("mu",
          expr("CAST(sx AS DOUBLE) / nn"))))
        .withColumn("tg_dec", expr(
          "CAST(ROUND(x / mu_g * ln(x / mu_g), 12) AS DECIMAL(28,12))"))
        .withColumn("tt_dec", expr(
          "CAST(ROUND(x / mu * ln(x / mu), 12) AS DECIMAL(28,12))"))
        .scopedPersist() // consumers: per-group sums + global sum
      val tTot = rows.agg(sum(col("tt_dec")).as("t_sum"))
      rows.groupBy(col("nk"))
        .agg(max(col("n_g")).as("n_g"), max(col("sx_g")).as("sx_g"),
          max(col("mu_g")).as("mu_g"), max(col("mu")).as("mu"),
          max(col("sx")).as("sx"), max(col("nn")).as("nn"),
          sum(col("tg_dec")).as("tg_sum"))
        .crossJoin(broadcast(tTot))
        .select(col("nk"), col("n_g"),
          round(col("mu_g"), 6).as("mean_cents"),
          expr("ROUND(CAST(tg_sum AS DOUBLE) / n_g, 6)").as("theil_g"),
          expr("ROUND(CAST(sx_g AS DOUBLE) / sx, 6)").as("share"),
          expr("ROUND(CAST(sx_g AS DOUBLE) / sx * ln(mu_g / mu), 6)")
            .as("between_term"),
          expr("ROUND(CAST(sx_g AS DOUBLE) / sx" +
            " * (CAST(tg_sum AS DOUBLE) / n_g), 6)").as("within_term"),
          expr("ROUND(CAST(t_sum AS DOUBLE) / nn, 6)").as("theil_total"))
        .orderBy(col("nk"))
    },

    // §2.3 (round 15) — BENJAMINI–HOCHBERG FDR correction (BH '95;
    // the multiple-testing step-up every per-source testing family
    // here feeds — q254/q260/q269 emit one test PER SOURCE, and
    // acting on raw p < 0.05 across dozens of strata is how
    // pipelines chase noise): per-source Welch z on doc length →
    // two-sided normal p via the SHARED A&S 26.2.17 tail polynomial
    // (functions/PValues — ONE SQL text evaluated by both engines, so
    // cross-engine parity is definitional), rank p ascending, flag
    // ranks ≤ argmax{i : p₍ᵢ₎ ≤ i·q/m} at q = 0.10. z is ROUNDED
    // to 6 before the polynomial so upstream last-ulp drift cannot
    // reach it. Windows sit over a source-domain aggregate (bounded).
    "q301_bh_fdr" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val per = Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_s"), sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
      val tot = per.agg(sum(col("n_s")).as("n"), sum(col("sx")).as("tsx"),
        sum(col("sxx")).as("tsxx"))
      val z = per.crossJoin(broadcast(tot))
        .withColumn("m1", expr("CAST(sx AS DOUBLE) / n_s"))
        .withColumn("m2", expr("CAST(tsx - sx AS DOUBLE) / (n - n_s)"))
        .withColumn("v1", expr("(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)" +
          " * CAST(sx AS DOUBLE) / n_s) / (n_s - 1)"))
        .withColumn("v2", expr("(CAST(tsxx - sxx AS DOUBLE)" +
          " - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE)" +
          " / (n - n_s)) / (n - n_s - 1)"))
        .withColumn("z6", expr(
          "ROUND((m1 - m2) / sqrt(v1 / n_s + v2 / (n - n_s)), 6)"))
        .withColumn("p", expr(graft.functions.PValues.twoSidedP("z6")))
        .withColumn("m", count(lit(1)).over(
          Window.partitionBy(lit(1))))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("p"), col("source"))))
        // CAST keeps the chain in pure DOUBLE on both engines (a bare
        // rank * 0.10 would run decimal arithmetic with
        // engine-specific scale rules)
        .withColumn("thr", expr("CAST(rank AS DOUBLE) * 0.1 / m"))
        .scopedPersist() // consumers: step-up cutoff + output
      val k = z.agg(max(when(col("p") <= col("thr"), col("rank"))
        .otherwise(lit(0))).as("k"))
      z.crossJoin(broadcast(k))
        .select(col("source"), col("n_s").as("n_docs"),
          col("z6").as("z"),
          expr("ROUND(p, 10)").as("p_value"),
          col("rank"), round(col("thr"), 6).as("bh_threshold"),
          (col("rank") <= col("k")).cast("int").as("is_discovery"))
        .orderBy(col("rank"))
    },

    // §2.4 (round 15) — HOLT double exponential smoothing (Holt '57;
    // level+trend — the forecasting step past q288's seasonal
    // indices and q281's naive baselines): per-priority monthly
    // order counts fold SEQUENTIALLY through l_t = αy_t+(1−α)(l+b),
    // b_t = β(l_t−l)+(1−β)b (α=0.5, β=0.3, l₁=y₁, b₁=0). The
    // recursion runs as ONE `aggregate` higher-order fold over the
    // sorted bounded month array per key (≤ ~8 years of months —
    // grows with TIME, not data; counts beneath are a partial-agg
    // groupBy at any scale), mirrored by a recursive CTE in DuckDB —
    // the same IEEE ops in the same order, textually identical.
    "q302_holt" -> { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("ym"))
        .agg(count(lit(1)).as("y"))
      val step = "0.5 * CAST(x.y AS DOUBLE) + 0.5 * (acc.lvl + acc.tr)"
      m.groupBy(col("prio"))
        .agg(sort_array(collect_list(struct(col("ym"), col("y")))).as("a"))
        .select(col("prio"), expr(
          s"""inline(aggregate(a,
             |  named_struct('lvl', CAST(0.0 AS DOUBLE),
             |    'tr', CAST(0.0 AS DOUBLE),
             |    'out', CAST(array() AS
             |      ARRAY<STRUCT<ym: BIGINT, y: BIGINT,
             |                   lvl: DOUBLE, tr: DOUBLE>>)),
             |  (acc, x) -> CASE WHEN size(acc.out) = 0 THEN named_struct(
             |      'lvl', CAST(x.y AS DOUBLE), 'tr', CAST(0.0 AS DOUBLE),
             |      'out', array(named_struct('ym', x.ym, 'y', x.y,
             |        'lvl', CAST(x.y AS DOUBLE), 'tr', CAST(0.0 AS DOUBLE))))
             |    ELSE named_struct(
             |      'lvl', $step,
             |      'tr', 0.3 * (($step) - acc.lvl) + 0.7 * acc.tr,
             |      'out', concat(acc.out, array(named_struct(
             |        'ym', x.ym, 'y', x.y,
             |        'lvl', $step,
             |        'tr', 0.3 * (($step) - acc.lvl) + 0.7 * acc.tr))))
             |  END,
             |  acc -> acc.out))""".stripMargin))
        .select(col("prio"), col("ym").as("month"), col("y"),
          round(col("lvl"), 6).as("level"),
          round(col("tr"), 6).as("trend"),
          round(col("lvl") + col("tr"), 6).as("forecast_next"))
        .orderBy(col("prio"), col("month"))
    },

    // §2.3 (round 15) — QUANTILE NORMALIZATION across sources (the
    // Bolstad '03 distribution-alignment step, the cross-source
    // length-bias remover a mixing pipeline applies before comparing
    // quality scores): each (source, length) maps to the pooled
    // length at the same cumulative share — i.e. the smallest pooled
    // value whose pooled CDF ≥ the source CDF. No θ-join: pooled
    // points and source points UNION into one value-domain frame
    // ordered by share (pool rows after tied source rows), and the
    // mapped value is min(pool value) over CURRENT ROW→FOLLOWING —
    // monotone, so the window min IS the asof lookup. All shares are
    // exact-integer ratios; frames are value-domain bounded.
    "q303_quantile_normalize" -> { (s, d) =>
      val vc = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
      val dom = vc.groupBy(col("v")).agg(sum(col("c")).as("m"))
        .withColumn("cm", sum(col("m")).over(
          Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val nTot = dom.agg(max(col("cm")).as("nn"))
      val pool = dom.crossJoin(broadcast(nTot))
        .select(lit(null).cast("string").as("source"),
          col("v"), lit(null).cast("long").as("c"),
          expr("CAST(cm AS DOUBLE) / nn").as("share"),
          lit(1).as("is_pool"), col("v").as("pv"))
      val perSrc = vc
        .withColumn("cs", sum(col("c")).over(
          Window.partitionBy(col("source")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n_s", sum(col("c")).over(
          Window.partitionBy(col("source"))))
        .select(col("source"), col("v"), col("c"),
          expr("CAST(cs AS DOUBLE) / n_s").as("share"),
          lit(0).as("is_pool"), lit(null).cast("long").as("pv"))
      perSrc.unionByName(pool)
        .withColumn("v_norm", min(col("pv")).over(
          Window.orderBy(col("share"), col("is_pool"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        .filter(col("is_pool") === 0)
        .select(col("source"), col("v").as("n_chars"), col("c").as("n_docs"),
          round(col("share"), 6).as("source_cdf"), col("v_norm"))
        .orderBy(col("source"), col("n_chars"))
    },

    // §2.3 (round 15) — FLEISS' KAPPA inter-rater agreement (Fleiss
    // '71): three deterministic quality raters (length ≥ 300 chars;
    // ≥ 60 whitespace tokens; mean token length < 8 chars) each vote
    // keep/drop per document, and kappa says whether the ensemble
    // agrees beyond chance — the audit run before trusting ANY
    // rule-combination filter (q36-family), and the same statistic
    // teams compute over human annotator batches. Category counts
    // per doc are pure integers off ONE narrow scan; P̄ and P_e come
    // from exact integer sums; kappa is the single terminal IEEE
    // chain. One 1-row aggregate, no shuffle beyond it.
    "q304_fleiss_kappa" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END").as("r1"),
          expr("CASE WHEN length(text) - length(replace(text, ' ', ''))" +
            " + 1 >= 60 THEN 1 ELSE 0 END").as("r2"),
          expr("CASE WHEN length(text) < 8 * (length(text)" +
            " - length(replace(text, ' ', '')) + 1) THEN 1 ELSE 0 END")
            .as("r3"))
        .withColumn("k", col("r1") + col("r2") + col("r3"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("r1")).as("keep_r1"), sum(col("r2")).as("keep_r2"),
          sum(col("r3")).as("keep_r3"), sum(col("k")).as("sk"),
          sum(col("k") * col("k") + (lit(3) - col("k"))
            * (lit(3) - col("k")) - lit(3)).as("sagree"))
        .select(col("n_docs"), col("keep_r1"), col("keep_r2"),
          col("keep_r3"),
          expr("ROUND(CAST(sagree AS DOUBLE) / (n_docs * 6), 6)")
            .as("p_bar"),
          expr("ROUND(CAST(sk AS DOUBLE) / (3 * n_docs), 6)")
            .as("p_keep"),
          expr("ROUND(pow(CAST(sk AS DOUBLE) / (3 * n_docs), 2.0)" +
            " + pow(1.0 - CAST(sk AS DOUBLE) / (3 * n_docs), 2.0), 6)")
            .as("p_e"),
          expr("ROUND((CAST(sagree AS DOUBLE) / (n_docs * 6)" +
            " - (pow(CAST(sk AS DOUBLE) / (3 * n_docs), 2.0)" +
            " + pow(1.0 - CAST(sk AS DOUBLE) / (3 * n_docs), 2.0)))" +
            " / (1.0 - (pow(CAST(sk AS DOUBLE) / (3 * n_docs), 2.0)" +
            " + pow(1.0 - CAST(sk AS DOUBLE) / (3 * n_docs), 2.0))), 6)")
            .as("fleiss_kappa"))
    },

    // §2.3 (round 15) — CLIFF'S DELTA effect size per source vs rest
    // (Cliff '93; the ordinal EFFECT SIZE that belongs next to
    // q260's Mann–Whitney SIGNIFICANCE — at 100 TB every test is
    // "significant", so the effect size is the actionable number):
    // δ = (#wins − #losses)/(n_s·n_r) over all cross pairs, computed
    // EXACTLY on the value domain — wins/losses/ties are integer
    // products of per-value counts with rest-side cumulative counts
    // (cb − sb), never a pair join. One value-domain join + bounded
    // windows + one partial-agg groupBy; a single terminal division.
    "q305_cliffs_delta" -> { (s, d) =>
      val vc = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
      val dom = vc.groupBy(col("v")).agg(sum(col("c")).as("m"))
        .withColumn("cb", coalesce(sum(col("m")).over(
          Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val tot = dom.agg(sum(col("m")).as("nn"))
      val ps = vc
        .withColumn("sb", coalesce(sum(col("c")).over(
          Window.partitionBy(col("source")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n_s", sum(col("c")).over(
          Window.partitionBy(col("source"))))
      ps.join(dom, "v").crossJoin(broadcast(tot))
        .withColumn("rb", col("cb") - col("sb"))
        .withColumn("ra", (col("nn") - col("cb") - col("m"))
          - (col("n_s") - col("sb") - col("c")))
        .groupBy(col("source"))
        // wins/losses/ties are Σ c·(cumulative counts) — ~n² terms;
        // DECIMAL(38,0) on both engines (the q281 overflow
        // discipline), and the n_s·n_rest pair-count denominator
        // likewise promoted before the terminal IEEE division
        .agg(max(col("n_s")).as("n_s"), max(col("nn")).as("nn"),
          sum(col("c").cast(DecimalType(38, 0)) * col("rb")).as("wins"),
          sum(col("c").cast(DecimalType(38, 0)) * col("ra")).as("losses"),
          sum(col("c").cast(DecimalType(38, 0)) * (col("m") - col("c")))
            .as("ties"))
        // rendered counts go back through BIGINT on both engines (the
        // driver's dtype contract); a decimal→long overflow NULLs
        // rather than wrapping, and δ itself divides the un-narrowed
        // decimals
        .select(col("source"), col("n_s"),
          (col("nn") - col("n_s")).as("n_rest"),
          col("wins").cast("long").as("wins"),
          col("losses").cast("long").as("losses"),
          col("ties").cast("long").as("ties"),
          expr("ROUND(CAST(wins - losses AS DOUBLE)" +
            " / (CAST(n_s AS DECIMAL(38,0)) * (nn - n_s)), 6)")
            .as("cliffs_delta"))
        .orderBy(col("source"))
    },

    // §2.3 (round 15) — CRAMÉR'S V with Bergsma bias correction
    // (Cramér '46 / Bergsma '13): the categorical EFFECT SIZE for
    // q269's chi-square independence — source × language here, the
    // "is the language mix actually different across sources, and by
    // how much" audit. Cell χ² terms are doubles off exact counts,
    // DECIMAL-quantized before the bounded cell sum; r, c, N exact.
    "q306_cramers_v" -> { (s, d) =>
      val ct = Tables.documents(s, d)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
      val rm = ct.groupBy(col("source")).agg(sum(col("o")).as("rs"))
      val cm = ct.groupBy(col("lang")).agg(sum(col("o")).as("cs"))
      val tot = ct.agg(sum(col("o")).as("n"),
        countDistinct(col("source")).as("r"),
        countDistinct(col("lang")).as("cc"))
      ct.join(rm, "source").join(cm, "lang").crossJoin(broadcast(tot))
        .withColumn("term", expr(
          "CAST(ROUND(pow(o - CAST(rs AS DOUBLE) * cs / n, 2.0)" +
            " / (CAST(rs AS DOUBLE) * cs / n), 12) AS DECIMAL(28,12))"))
        .agg(max(col("n")).as("n"), max(col("r")).as("r"),
          max(col("cc")).as("c"), sum(col("term")).as("chi2d"))
        .select(col("n"), col("r"), col("c"),
          expr("ROUND(CAST(chi2d AS DOUBLE), 6)").as("chi2"),
          expr("ROUND(sqrt(CAST(chi2d AS DOUBLE)" +
            " / (n * least(r - 1, c - 1))), 6)").as("cramers_v"),
          expr("ROUND(sqrt(greatest(0.0, CAST(chi2d AS DOUBLE) / n" +
            " - CAST((r - 1) * (c - 1) AS DOUBLE) / (n - 1))" +
            " / least(r - CAST((r - 1) * (r - 1) AS DOUBLE) / (n - 1)" +
            " - 1.0, c - CAST((c - 1) * (c - 1) AS DOUBLE) / (n - 1)" +
            " - 1.0)), 6)").as("cramers_v_bc"))
    },

    // §2.3 (round 15) — COCHRAN–MANTEL–HAENSZEL stratified test (CMH
    // '59/'63; "is priority associated with high order value AFTER
    // controlling for nation" — the Simpson's-paradox-proof
    // association test; q269's chi-square would confound the strata):
    // per-nation 2×2 counts are exact integers; E and Var terms are
    // doubles DECIMAL-quantized before their bounded (25-stratum)
    // sums; the 1-df χ² p-value reuses the SHARED normal-tail
    // polynomial via P(χ²₁>x) = 2(1−Φ(√x)).
    "q307_cmh" -> { (s, d) =>
      val per = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").cast("long").as("nk"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("x"),
          when(round(col("o_totalprice") * 100, 0).cast("long")
            >= 15000000L, 1L).otherwise(0L).as("y"))
        .groupBy(col("nk"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("r1"),
          sum(col("y")).as("c1"), sum(col("x") * col("y")).as("a"))
        .filter(col("n") >= 2)
        .withColumn("e_dec", expr("CAST(ROUND(CAST(r1 AS DOUBLE) * c1" +
          " / n, 12) AS DECIMAL(28,12))"))
        .withColumn("v_dec", expr(
          "CAST(ROUND(CAST(r1 AS DOUBLE) * (n - r1) * c1 * (n - c1)" +
            " / (CAST(n AS DOUBLE) * n * (n - 1)), 12)" +
            " AS DECIMAL(28,12))"))
      per.agg(count(lit(1)).as("n_strata"), sum(col("a")).as("sum_a"),
        sum(col("e_dec")).as("se"), sum(col("v_dec")).as("sv"))
        .withColumn("chi2r", expr(
          "ROUND(pow(sum_a - CAST(se AS DOUBLE), 2.0)" +
            " / CAST(sv AS DOUBLE), 6)"))
        .select(col("n_strata"), col("sum_a"),
          expr("ROUND(CAST(se AS DOUBLE), 6)").as("sum_expected"),
          col("chi2r").as("chi2_cmh"),
          expr(s"ROUND(${graft.functions.PValues.twoSidedP("sqrt(chi2r)")}, 10)")
            .as("p_value"))
    },

    // §2.3 (round 15) — WILSON SCORE INTERVAL per source (Wilson
    // '27; the proportion CI that behaves at p→0/1 and small n,
    // which Wald intervals do not — the right uncertainty band for
    // per-source keep rates before acting on a 0.02 difference):
    // k, n exact integers; the closed form is one textually shared
    // IEEE chain with z = 1.959964 pinned as a double.
    "q308_wilson_ci" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_chars") >= 300, 1L).otherwise(0L)).as("k_keep"))
        .withColumn("zz", expr("CAST(1.959964 AS DOUBLE)"))
        .withColumn("ph", expr("CAST(k_keep AS DOUBLE) / n_docs"))
        .withColumn("dn", expr("1.0 + zz * zz / n_docs"))
        .withColumn("ctr", expr("(ph + zz * zz / (2.0 * n_docs)) / dn"))
        .withColumn("hw", expr("zz * sqrt(ph * (1.0 - ph) / n_docs" +
          " + zz * zz / (4.0 * n_docs * n_docs)) / dn"))
        .select(col("source"), col("n_docs"), col("k_keep"),
          round(col("ph"), 6).as("p_hat"),
          expr("ROUND(greatest(0.0, ctr - hw), 6)").as("wilson_lo"),
          expr("ROUND(least(1.0, ctr + hw), 6)").as("wilson_hi"))
        .orderBy(col("source"))
    },

    // §2.3 (round 15) — BRIER SCORE with Murphy decomposition
    // (Murphy '73: BS = reliability − resolution + uncertainty): the
    // calibration-vs-discrimination split for a deterministic
    // length-proxy quality model (p̂ = clamp(chars/1000)) scored
    // against the q304 2-of-3 rater-ensemble label — says WHETHER
    // the cheap model is miscalibrated (REL) or just uninformative
    // (low RES) before anyone retrains it. p̂ lives on an exact
    // DECIMAL(9,6) grid so Σp̂, Σp̂², Σp̂y are exact; bin terms are
    // quantized before their 10-row sums; floor() keeps binning
    // identical across engines (CAST-to-int rounds differently).
    "q309_brier" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val rows = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          expr("CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END" +
            " + CASE WHEN length(text) - length(replace(text, ' ', ''))" +
            " + 1 >= 60 THEN 1 ELSE 0 END" +
            " + CASE WHEN length(text) < 8 * (length(text)" +
            " - length(replace(text, ' ', '')) + 1) THEN 1 ELSE 0 END")
            .as("votes"))
        .select(
          expr("CAST(least(0.99, greatest(0.01," +
            " CAST(n_chars AS DOUBLE) / 1000)) AS DECIMAL(9,6))").as("p"),
          expr("CASE WHEN votes >= 2 THEN 1 ELSE 0 END").as("y"))
        .withColumn("bin", expr("least(9, CAST(floor(p * 10) AS INT))"))
      val bins = rows.groupBy(col("bin"))
        .agg(count(lit(1)).as("n_b"), sum(col("p")).as("sp"),
          sum(col("y")).as("sy"), sum(col("p") * col("p")).as("spp"),
          sum(col("p") * col("y")).as("spy"))
        .scopedPersist() // consumers: totals + per-bin terms
      val tot = bins.agg(sum(col("n_b")).as("nn"), sum(col("sy")).as("ty"),
        sum(col("spp")).as("tpp"), sum(col("spy")).as("tpy"))
      val terms = bins.crossJoin(broadcast(tot))
        .withColumn("rel_dec", expr(
          "CAST(ROUND(n_b * pow(CAST(sp AS DOUBLE) / n_b" +
            " - CAST(sy AS DOUBLE) / n_b, 2.0), 12) AS DECIMAL(28,12))"))
        .withColumn("res_dec", expr(
          "CAST(ROUND(n_b * pow(CAST(sy AS DOUBLE) / n_b" +
            " - CAST(ty AS DOUBLE) / nn, 2.0), 12) AS DECIMAL(28,12))"))
        // generalized (binned) decomposition: within-bin forecast
        // variance and within-bin forecast/label covariance — with
        // these the identity BS = REL − RES + UNC + WBV − WBC is
        // EXACT even though forecasts vary inside a bin
        .withColumn("wbv_dec", expr(
          "CAST(ROUND(CAST(spp AS DOUBLE) - CAST(sp AS DOUBLE)" +
            " * CAST(sp AS DOUBLE) / n_b, 12) AS DECIMAL(28,12))"))
        .withColumn("wbc_dec", expr(
          "CAST(ROUND(2.0 * (CAST(spy AS DOUBLE) - CAST(sp AS DOUBLE)" +
            " * sy / n_b), 12) AS DECIMAL(28,12))"))
      terms.agg(max(col("nn")).as("nn"), max(col("ty")).as("ty"),
        max(col("tpp")).as("tpp"), max(col("tpy")).as("tpy"),
        sum(col("rel_dec")).as("rel"), sum(col("res_dec")).as("res"),
        sum(col("wbv_dec")).as("wbv"), sum(col("wbc_dec")).as("wbc"))
        .select(col("nn").as("n_docs"),
          expr("ROUND((CAST(tpp AS DOUBLE) - 2.0 * CAST(tpy AS DOUBLE)" +
            " + ty) / nn, 6)").as("brier"),
          expr("ROUND(CAST(rel AS DOUBLE) / nn, 6)").as("reliability"),
          expr("ROUND(CAST(res AS DOUBLE) / nn, 6)").as("resolution"),
          expr("ROUND(CAST(ty AS DOUBLE) / nn" +
            " * (1.0 - CAST(ty AS DOUBLE) / nn), 6)").as("uncertainty"),
          expr("ROUND(CAST(wbv AS DOUBLE) / nn, 6)").as("within_bin_var"),
          expr("ROUND(CAST(wbc AS DOUBLE) / nn, 6)").as("within_bin_cov"),
          expr("ROUND(CAST(ty AS DOUBLE) / nn, 6)").as("base_rate"))
    },

    // §2.3 (round 15) — NELSON–AALEN cumulative hazard (Nelson '72 /
    // Aalen '78; the estimator survival texts pair with q268's
    // Kaplan–Meier: H(t) = Σ d/n with variance Σ d/n², plus the
    // Fleming–Harrington survival exp(−H) — better-behaved than the
    // product-limit in small risk sets, and the quantity hazard-rate
    // models calibrate against). Same lifetime/censoring construction
    // as q268; per-time d/n terms are doubles DECIMAL-quantized
    // before their duration-domain cumulative sums (bounded by the
    // day domain, aggregate beneath) — no exp∘Σ∘ln needed and the
    // d=n absorbing state is a plain H += 1 step, not a −∞ guard.
    "q310_nelson_aalen" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val life = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(min(to_date(col("o_orderdate"))).as("first_d"),
          max(to_date(col("o_orderdate"))).as("last_d"))
        .scopedPersist() // consumers: horizon + the duration rollup
      val hor = life.agg(max(col("last_d")).as("horizon"))
      val byT = life.crossJoin(broadcast(hor))
        .select(datediff(col("last_d"), col("first_d")).as("t"),
          (col("last_d") <= date_sub(col("horizon"), 90))
            .cast("long").as("ev"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("m"), sum(col("ev")).as("dd"))
      val tot = byT.agg(sum(col("m")).as("nn"))
      val cumW = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val runW = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.crossJoin(broadcast(tot))
        .withColumn("at_risk",
          col("nn") - coalesce(sum(col("m")).over(cumW), lit(0L)))
        .withColumn("h_dec", expr(
          "CAST(ROUND(CAST(dd AS DOUBLE) / at_risk, 12)" +
            " AS DECIMAL(28,12))"))
        .withColumn("v_dec", expr(
          "CAST(ROUND(CAST(dd AS DOUBLE)" +
            " / (CAST(at_risk AS DOUBLE) * at_risk), 12)" +
            " AS DECIMAL(28,12))"))
        .withColumn("ch", sum(col("h_dec")).over(runW))
        .withColumn("cv", sum(col("v_dec")).over(runW))
        .filter(col("dd") > 0)
        .select(col("t").cast("long").as("duration_days"),
          col("at_risk"), col("dd").as("n_events"),
          expr("ROUND(CAST(ch AS DOUBLE), 6)").as("cum_hazard"),
          expr("ROUND(exp(-CAST(ch AS DOUBLE)), 6)").as("fh_survival"),
          expr("ROUND(CAST(cv AS DOUBLE), 6)").as("hazard_var"))
        .orderBy(col("duration_days"))
    },

    // §2.3 (round 15) — LOG-RANK TEST (Mantel '66; "do BUILDING-
    // segment customers churn on a different clock than everyone
    // else" — THE two-group survival comparison, and the q307 CMH
    // statistic summed over event-time strata instead of nations):
    // per event time the 2×2 is (events, at-risk) × (group 1, rest);
    // at-risk counts come from per-group cumulative windows over the
    // SHARED duration grid (the q271 dense-grid precedent) so both
    // groups are evaluated at every event time; E and hypergeometric
    // V terms are DECIMAL-quantized before their day-domain sums;
    // 1-df p via the shared normal-tail polynomial.
    "q311_log_rank" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val life = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
            .as("g"))
        .agg(min(to_date(col("o_orderdate"))).as("first_d"),
          max(to_date(col("o_orderdate"))).as("last_d"))
        .scopedPersist() // consumers: horizon + the (t, g) rollup
      val hor = life.agg(max(col("last_d")).as("horizon"))
      val byTG = life.crossJoin(broadcast(hor))
        .select(datediff(col("last_d"), col("first_d")).as("t"), col("g"),
          (col("last_d") <= date_sub(col("horizon"), 90))
            .cast("long").as("ev"))
        .groupBy(col("t"), col("g"))
        .agg(count(lit(1)).as("m"), sum(col("ev")).as("dd"))
        .scopedPersist() // consumers: grid spine + the measure join
      val grid = byTG.select(col("t")).distinct()
        .crossJoin(broadcast(byTG.select(col("g")).distinct()))
      val full = grid.join(byTG, Seq("t", "g"), "left")
        .na.fill(0L, Seq("m", "dd"))
        .withColumn("cb", coalesce(sum(col("m")).over(
          Window.partitionBy(col("g")).orderBy(col("t"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n_g", sum(col("m")).over(
          Window.partitionBy(col("g"))))
        .withColumn("ar", col("n_g") - col("cb"))
      val byT = full.groupBy(col("t"))
        .agg(sum(col("dd")).as("d"), sum(col("ar")).as("n"),
          sum(when(col("g") === 1, col("dd")).otherwise(0L)).as("d1"),
          sum(when(col("g") === 1, col("ar")).otherwise(0L)).as("n1"),
          max(when(col("g") === 1, col("n_g")).otherwise(0L)).as("sz1"),
          max(when(col("g") === 0, col("n_g")).otherwise(0L)).as("sz0"))
        .filter(col("d") > 0 && col("n") > 1)
        .withColumn("e_dec", expr(
          "CAST(ROUND(CAST(d AS DOUBLE) * n1 / n, 12)" +
            " AS DECIMAL(28,12))"))
        .withColumn("v_dec", expr(
          "CAST(ROUND(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n)" +
            " * (1.0 - CAST(n1 AS DOUBLE) / n) * (n - d) / (n - 1), 12)" +
            " AS DECIMAL(28,12))"))
      byT.agg(max(col("sz1")).as("n_group1"), max(col("sz0")).as("n_rest"),
        sum(col("d1")).as("observed_1"), sum(col("e_dec")).as("se"),
        sum(col("v_dec")).as("sv"))
        .withColumn("chi2r", expr(
          "ROUND(pow(observed_1 - CAST(se AS DOUBLE), 2.0)" +
            " / CAST(sv AS DOUBLE), 6)"))
        .select(col("n_group1"), col("n_rest"), col("observed_1"),
          expr("ROUND(CAST(se AS DOUBLE), 6)").as("expected_1"),
          col("chi2r").as("chi2_logrank"),
          expr(s"ROUND(${graft.functions.PValues.twoSidedP("sqrt(chi2r)")}, 10)")
            .as("p_value"))
    },

    // §2.3 (round 15) — LIFT / GAINS DECILES for a quality model
    // (the decile capture table every targeting/selection review
    // reads next to AUC q166 and calibration q309): docs rank by the
    // deterministic length-proxy score DESC on the VALUE DOMAIN
    // (bounded score grid — never a row-level global sort); each
    // distinct score lands wholly in the decile of its cumulative
    // start (integer math, so engines agree on stragglers); per
    // decile: volume, positives, rate, cumulative capture of all
    // positives, and lift vs the base rate — every number a ratio of
    // exact integers.
    "q312_lift_deciles" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val vc = Tables.documents(s, d)
        .select(
          expr("CAST(least(0.99, greatest(0.01," +
            " CAST(n_chars AS DOUBLE) / 1000)) AS DECIMAL(9,6))").as("p"),
          expr("CASE WHEN (CASE WHEN length(text) >= 300 THEN 1 ELSE 0" +
            " END + CASE WHEN length(text) - length(replace(text," +
            " ' ', '')) + 1 >= 60 THEN 1 ELSE 0 END" +
            " + CASE WHEN length(text) < 8 * (length(text)" +
            " - length(replace(text, ' ', '')) + 1) THEN 1 ELSE 0 END)" +
            " >= 2 THEN 1 ELSE 0 END").as("y"))
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
        .withColumn("cb", coalesce(sum(col("n")).over(
          Window.orderBy(col("p").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .scopedPersist() // consumers: totals + the decile rollup
      val tot = vc.agg(sum(col("n")).as("nn"), sum(col("pos")).as("tp"))
      vc.crossJoin(broadcast(tot))
        .withColumn("decile", expr("(cb * 10) div nn + 1"))
        .groupBy(col("decile"))
        .agg(max(col("nn")).as("nn"), max(col("tp")).as("tp"),
          sum(col("n")).as("n_docs"), sum(col("pos")).as("n_pos"))
        .withColumn("cpos", sum(col("n_pos")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cn", sum(col("n_docs")).over(
          Window.orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("decile").cast("long").as("decile"), col("n_docs"),
          col("n_pos"),
          expr("ROUND(CAST(n_pos AS DOUBLE) / n_docs, 6)").as("pos_rate"),
          expr("ROUND(CAST(cpos AS DOUBLE) / tp, 6)").as("cum_capture"),
          expr("ROUND((CAST(cpos AS DOUBLE) / cn)" +
            " / (CAST(tp AS DOUBLE) / nn), 6)").as("cum_lift"))
        .orderBy(col("decile"))
    },

    // §2.3 (round 15) — SAMPLE-RATIO-MISMATCH check (the Kohavi
    // trustworthy-experiments health gate: a 50/50 assignment whose
    // observed split is improbably off means the pipeline is eating
    // users and EVERY downstream test — q254/q260/q301 — is invalid):
    // three seeded deterministic md5 hash-assignments (the q296
    // idiom) over customers, 1-df chi-square vs the expected halves,
    // p via the shared normal-tail polynomial, flag at p < 0.001.
    // ONE narrow scan + a bounded (3 × 2) groupBy.
    "q314_srm_check" -> { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
          explode(array(lit("exp1"), lit("exp2"), lit("exp3")))
            .as("experiment"))
        .withColumn("arm", conv(substring(md5(concat(col("experiment"),
          lit(":"), col("c_custkey").cast("string"))), 1, 12), 16, 10)
          .cast("long") % 2)
        .groupBy(col("experiment"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_arm1"))
        .withColumn("n_arm0", col("n") - col("n_arm1"))
        .withColumn("chi2r", expr(
          "ROUND(pow(n_arm1 - CAST(n AS DOUBLE) / 2, 2.0)" +
            " / (CAST(n AS DOUBLE) / 2)" +
            " + pow(n_arm0 - CAST(n AS DOUBLE) / 2, 2.0)" +
            " / (CAST(n AS DOUBLE) / 2), 6)"))
        .withColumn("p", expr(
          s"ROUND(${graft.functions.PValues.twoSidedP("sqrt(chi2r)")}, 10)"))
        .select(col("experiment"), col("n"), col("n_arm0"), col("n_arm1"),
          col("chi2r").as("chi2"), col("p").as("p_value"),
          expr("CAST(CASE WHEN p < 0.001 THEN 1 ELSE 0 END AS INT)")
            .as("srm_flag"))
        .orderBy(col("experiment"))
    },

    // §2.3 (round 15) — LORENZ CURVE deciles per source (the
    // concentration table behind q223's Gini scalar: HOW the token
    // mass piles up — "the top decile of documents carries X% of the
    // chars" is the sentence a mixing decision quotes): docs rank by
    // length ASC on the value domain, deciles by integer
    // cumulative-start math (the q312 discipline), per decile exact
    // char mass and the cumulative population/mass shares. Windows
    // sit over (source × value-domain) aggregates.
    "q315_lorenz" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val vc = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("n"))
        .withColumn("mass", col("v") * col("n"))
        .withColumn("cb", coalesce(sum(col("n")).over(
          Window.partitionBy(col("source")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .scopedPersist() // consumers: totals + the decile rollup
      val tot = vc.groupBy(col("source"))
        .agg(sum(col("n")).as("nn"), sum(col("mass")).as("tm"))
      vc.join(broadcast(tot), "source")
        .withColumn("decile", expr("(cb * 10) div nn + 1"))
        .groupBy(col("source"), col("decile"))
        .agg(max(col("nn")).as("nn"), max(col("tm")).as("tm"),
          sum(col("n")).as("n_docs"), sum(col("mass")).as("chars"))
        .withColumn("cn", sum(col("n_docs")).over(
          Window.partitionBy(col("source")).orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cm", sum(col("chars")).over(
          Window.partitionBy(col("source")).orderBy(col("decile"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("source"), col("decile").cast("long").as("decile"),
          col("n_docs"), col("chars"),
          expr("ROUND(CAST(cn AS DOUBLE) / nn, 6)").as("cum_pop_share"),
          expr("ROUND(CAST(cm AS DOUBLE) / tm, 6)").as("cum_mass_share"))
        .orderBy(col("source"), col("decile"))
    },

    // §2.3 (round 15) — KRUSKAL–WALLIS omnibus rank test (KW '52;
    // the k-group extension of q260's per-source Mann–Whitney: ONE
    // test for "do ANY of the sources differ in length
    // distribution", run before the per-source drill-down + q301's
    // BH correction): doubled midranks on the value domain (the q260
    // r2 = 2·cb + m + 1 machinery, all exact integers), per-group
    // doubled rank-sums exact BIGINTs, the Σ R²/n terms and the tie
    // correction Σ(t³−t) evaluated as quantized decimals over the
    // bounded group/value domains.
    "q318_kruskal_wallis" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val vc = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
        .scopedPersist() // consumers: value domain + per-group sums
      val dom = vc.groupBy(col("v")).agg(sum(col("c")).as("m"))
        .withColumn("cb", coalesce(sum(col("m")).over(
          Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("r2", lit(2) * col("cb") + col("m") + 1)
      // m³ tie term + doubled rank-sum promoted to DECIMAL(38,0)
      // (the q281 overflow discipline — a Long wraps at ~2.1M-row
      // value bins); oracle mirrored
      val ties = dom.agg(sum(col("m")).as("nn"),
        sum(col("m").cast(DecimalType(38, 0)) * col("m") * col("m")
          - col("m")).as("tsum"))
      val per = vc.join(dom.select(col("v"), col("r2")), "v")
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_s"),
          sum(col("c").cast(DecimalType(38, 0)) * col("r2")).as("r2_s"))
      val terms = per.crossJoin(broadcast(ties))
        .withColumn("term", expr(
          "CAST(ROUND(CAST(r2_s AS DOUBLE) * r2_s / (4.0 * n_s), 12)" +
            " AS DECIMAL(38,12))"))
      terms.agg(count(lit(1)).as("k"), max(col("nn")).as("nn"),
        max(col("tsum")).as("tsum"), sum(col("term")).as("sr"))
        .withColumn("h", expr(
          "12.0 / (CAST(nn AS DOUBLE) * (nn + 1)) * CAST(sr AS DOUBLE)" +
            " - 3.0 * (nn + 1)"))
        .select(col("k").as("n_groups"), col("nn").as("n_docs"),
          (col("k") - 1).as("df"), round(col("h"), 6).as("h_stat"),
          expr("ROUND(h / (1.0 - CAST(tsum AS DOUBLE)" +
            " / (CAST(nn AS DOUBLE) * nn * nn - nn)), 6)")
            .as("h_tie_corrected"))
    },

    // §2.3 (round 15) — ONE-WAY ANOVA F (Fisher; the parametric
    // omnibus next to q318's rank form, and the source of the
    // variance-explained η² a mixing report quotes): SSB/SSW from
    // EXACT integer moments (Σx, Σx² per source — the q254
    // discipline), per-group terms quantized before the bounded
    // group-domain sums, F and η² as terminal IEEE chains.
    "q319_anova_f" -> { (s, d) =>
      val per = Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_s"), sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
      val tot = per.agg(sum(col("n_s")).as("nn"), sum(col("sx")).as("tsx"),
        sum(col("sxx")).as("tsxx"), count(lit(1)).as("k"))
      per.crossJoin(broadcast(tot))
        .withColumn("ssb_dec", expr(
          "CAST(ROUND(n_s * pow(CAST(sx AS DOUBLE) / n_s" +
            " - CAST(tsx AS DOUBLE) / nn, 2.0), 12) AS DECIMAL(38,12))"))
        .withColumn("ssw_dec", expr(
          "CAST(ROUND(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx" +
            " / n_s, 12) AS DECIMAL(38,12))"))
        .groupBy()
        .agg(max(col("k")).as("k"), max(col("nn")).as("nn"),
          max(col("tsx")).as("tsx"), max(col("tsxx")).as("tsxx"),
          sum(col("ssb_dec")).as("ssb"), sum(col("ssw_dec")).as("ssw"))
        .select(col("k").as("n_groups"), col("nn").as("n_docs"),
          (col("k") - 1).as("df_between"),
          (col("nn") - col("k")).as("df_within"),
          expr("ROUND(CAST(ssb AS DOUBLE), 4)").as("ss_between"),
          expr("ROUND(CAST(ssw AS DOUBLE), 4)").as("ss_within"),
          expr("ROUND((CAST(ssb AS DOUBLE) / (k - 1))" +
            " / (CAST(ssw AS DOUBLE) / (nn - k)), 6)").as("f_stat"),
          expr("ROUND(CAST(ssb AS DOUBLE)" +
            " / (CAST(ssb AS DOUBLE) + CAST(ssw AS DOUBLE)), 6)")
            .as("eta_squared"))
    },

    // §2.3 (round 15) — BROWN–FORSYTHE variance-homogeneity test (BF
    // '74; Levene with the MEDIAN center — the robust "are the
    // spreads equal" gate that decides whether q319's pooled-variance
    // F or q254's Welch form is the right comparison): per-source
    // medians are exact nearest-rank value-domain picks (the q285
    // integer-MAD discipline), |x − med| stays an exact integer, and
    // the one-way F on those deviations reuses the exact-moment
    // machinery end to end.
    "q320_brown_forsythe" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val vc = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
        .scopedPersist() // consumers: median pick + deviation moments
      val med = vc
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("source")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n_s", sum(col("c")).over(
          Window.partitionBy(col("source"))))
        .groupBy(col("source"))
        .agg(min(when(col("cum") * 2 >= col("n_s"), col("v"))).as("med"))
      val dev = vc.join(broadcast(med), "source")
        .withColumn("z", abs(col("v") - col("med")))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_s"), sum(col("c") * col("z")).as("sz"),
          sum(col("c") * col("z") * col("z")).as("szz"))
      val tot = dev.agg(sum(col("n_s")).as("nn"), sum(col("sz")).as("tsz"),
        sum(col("szz")).as("tszz"), count(lit(1)).as("k"))
      dev.crossJoin(broadcast(tot))
        .withColumn("ssb_dec", expr(
          "CAST(ROUND(n_s * pow(CAST(sz AS DOUBLE) / n_s" +
            " - CAST(tsz AS DOUBLE) / nn, 2.0), 12) AS DECIMAL(38,12))"))
        .withColumn("ssw_dec", expr(
          "CAST(ROUND(CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz" +
            " / n_s, 12) AS DECIMAL(38,12))"))
        .groupBy()
        .agg(max(col("k")).as("k"), max(col("nn")).as("nn"),
          sum(col("ssb_dec")).as("ssb"), sum(col("ssw_dec")).as("ssw"))
        .select(col("k").as("n_groups"), col("nn").as("n_docs"),
          (col("k") - 1).as("df_between"),
          (col("nn") - col("k")).as("df_within"),
          expr("ROUND((CAST(ssb AS DOUBLE) / (k - 1))" +
            " / (CAST(ssw AS DOUBLE) / (nn - k)), 6)").as("f_stat"))
    },

    // §2.3 (round 15) — POST-HOC PAIRWISE COMPARISONS with the pooled
    // ANOVA error (the Tukey-HSD shape: after q319 says "some source
    // differs", WHICH pairs differ?): every source pair's mean
    // difference standardized by √(MSW·(1/n_a+1/n_b)) — MSW from the
    // same exact-moment SSW as q319. The pair table is |sources|²
    // rows (dimension-sized); moments ride in via ONE groupBy + a
    // 1-row broadcast; no corpus re-scan per pair.
    "q321_tukey_pairs" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val per = Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_s"), sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
        .scopedPersist() // consumers: MSW + both pair sides
      val msw = per
        .withColumn("ssw_dec", expr(
          "CAST(ROUND(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx" +
            " / n_s, 12) AS DECIMAL(38,12))"))
        .agg(sum(col("ssw_dec")).as("ssw"), sum(col("n_s")).as("nn"),
          count(lit(1)).as("k"))
        .select(expr("CAST(ssw AS DOUBLE) / (nn - k)").as("msw"))
      val a = per.select(col("source").as("source_a"),
        col("n_s").as("n_a"), col("sx").as("sx_a"))
      val b = per.select(col("source").as("source_b"),
        col("n_s").as("n_b"), col("sx").as("sx_b"))
      a.join(b, col("source_a") < col("source_b"))
        .crossJoin(broadcast(msw))
        .withColumn("diff", expr(
          "CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b"))
        .withColumn("se", expr(
          "sqrt(msw * (1.0 / n_a + 1.0 / n_b))"))
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          round(col("diff"), 6).as("mean_diff"),
          round(col("se"), 6).as("std_err"),
          expr("ROUND(diff / se, 6)").as("t_stat"))
        .orderBy(col("source_a"), col("source_b"))
    },

    // §2.4 (round 15) — GUMBEL EXTREME-VALUE fit on block maxima
    // (Gumbel '58, method of moments: β̂ = s·√6/π, μ̂ = x̄ − γ·β̂):
    // monthly maxima of order value per priority are EXACT integer
    // cents (one partial-agg groupBy), their moments exact integer
    // sums over the bounded month domain, and the fitted location /
    // scale / 99% return level are terminal IEEE chains — the
    // capacity-planning read ("how big an order should next year's
    // worst month expect") that a plain p99 over all orders
    // understates by construction.
    "q322_gumbel_evt" -> { (s, d) =>
      val bm = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("ym"))
        .agg(max(round(col("o_totalprice") * 100, 0).cast("long")).as("bm"))
      bm.groupBy(col("prio"))
        .agg(count(lit(1)).as("n_blocks"), sum(col("bm")).as("s1"),
          sum(col("bm") * col("bm")).as("s2"))
        .withColumn("mean", expr("CAST(s1 AS DOUBLE) / n_blocks"))
        .withColumn("sd", expr(
          "sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1" +
            " / n_blocks) / (n_blocks - 1))"))
        .withColumn("beta", expr(
          "sd * sqrt(CAST(6.0 AS DOUBLE)) / CAST(3.141592653589793" +
            " AS DOUBLE)"))
        .withColumn("mu", expr(
          "mean - CAST(0.5772156649015329 AS DOUBLE) * beta"))
        .select(col("prio"), col("n_blocks"),
          round(col("mean"), 6).as("mean_block_max"),
          round(col("sd"), 6).as("sd_block_max"),
          round(col("mu"), 6).as("gumbel_mu"),
          round(col("beta"), 6).as("gumbel_beta"),
          expr("ROUND(mu - beta * ln(-ln(CAST(0.99 AS DOUBLE))), 6)")
            .as("p99_return_level"))
        .orderBy(col("prio"))
    },

    // §2.3 (round 15) — PAIRWISE RATER AGREEMENT: McNemar's paired
    // test (McNemar '47 — do two quality rules disagree
    // SYSTEMATICALLY, i.e. is one strictly stricter, which the
    // marginal rates alone can't tell you) + Cohen's kappa per rater
    // pair, for the three q304 raters. One narrow scan, one 1-row
    // aggregate of twelve exact integer sums, unpivoted to the three
    // pairs via stack/UNION; χ² = (b−c)²/(b+c) (1 df, p via the
    // shared polynomial), κ from the 2×2 margins.
    "q316_rater_pairs" -> { (s, d) =>
      val base = Tables.documents(s, d)
        .select(
          expr("CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END").as("r1"),
          expr("CASE WHEN length(text) - length(replace(text, ' ', ''))" +
            " + 1 >= 60 THEN 1 ELSE 0 END").as("r2"),
          expr("CASE WHEN length(text) < 8 * (length(text)" +
            " - length(replace(text, ' ', '')) + 1) THEN 1 ELSE 0 END")
            .as("r3"))
      def cell(x: String, y: String, vx: Int, vy: Int) =
        sum(when(col(x) === vx && col(y) === vy, 1L).otherwise(0L))
      val agg = base.agg(
        cell("r1", "r2", 1, 1).as("a12"), cell("r1", "r2", 1, 0).as("b12"),
        cell("r1", "r2", 0, 1).as("c12"), cell("r1", "r2", 0, 0).as("d12"),
        cell("r1", "r3", 1, 1).as("a13"), cell("r1", "r3", 1, 0).as("b13"),
        cell("r1", "r3", 0, 1).as("c13"), cell("r1", "r3", 0, 0).as("d13"),
        cell("r2", "r3", 1, 1).as("a23"), cell("r2", "r3", 1, 0).as("b23"),
        cell("r2", "r3", 0, 1).as("c23"), cell("r2", "r3", 0, 0).as("d23"))
      agg.select(expr(
        "stack(3, 'r1_vs_r2', a12, b12, c12, d12," +
          "         'r1_vs_r3', a13, b13, c13, d13," +
          "         'r2_vs_r3', a23, b23, c23, d23)" +
          " AS (pair, a, b, c, d)"))
        .withColumn("n", col("a") + col("b") + col("c") + col("d"))
        .withColumn("chi2r", expr(
          "CASE WHEN b + c = 0 THEN 0.0" +
            " ELSE ROUND(pow(CAST(b - c AS DOUBLE), 2.0) / (b + c), 6)" +
            " END"))
        .withColumn("po", expr("CAST(a + d AS DOUBLE) / n"))
        .withColumn("pe", expr(
          "(CAST(a + b AS DOUBLE) / n) * (CAST(a + c AS DOUBLE) / n)" +
            " + (CAST(c + d AS DOUBLE) / n) * (CAST(b + d AS DOUBLE) / n)"))
        .select(col("pair"), col("a"), col("b"), col("c"), col("d"),
          col("chi2r").as("chi2_mcnemar"),
          expr(s"ROUND(${graft.functions.PValues.twoSidedP("sqrt(chi2r)")}, 10)")
            .as("p_value"),
          round(col("po"), 6).as("agreement"),
          expr("ROUND((po - pe) / (1.0 - pe), 6)").as("cohens_kappa"))
        .orderBy(col("pair"))
    },

    // §2.4 (round 15) — CLASSICAL ADDITIVE SEASONAL DECOMPOSITION
    // (the moving-average y = trend + seasonal + residual split — the
    // step past q288's raw seasonal indices and the input Holt q302
    // doesn't model): per-priority monthly order counts; trend is the
    // centered 12-month MA ((y₋₆/2 + Σ±5 + y₊₆/2)/12 — exact integer
    // window sums, null at the edges), detrended values are
    // decimal-quantized before the month-of-year means, seasonal
    // components CENTER to zero-sum per key, residual closes the
    // identity. All windows partition by key over the bounded month
    // domain.
    "q317_seasonal_decompose" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val m = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("prio"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
            .cast("long").as("ym"),
          month(col("o_orderdate")).cast("long").as("moy"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy(col("prio")).orderBy(col("ym"))
      // centered-MA trend (l6 + 2·s11 + f6)/24 kept as an EXACT
      // integer numerator (denominator 24), so the detrended values
      // sum exactly per month-of-year — no ROUND-at-scale-6 inside
      // the computation (the midpoint-semantics trap: Spark HALF_UP
      // vs DuckDB float-multiply diverge on near-midpoint doubles)
      val det = m
        .withColumn("l6", lag(col("y"), 6).over(w))
        .withColumn("f6", lead(col("y"), 6).over(w))
        .withColumn("s11", sum(col("y")).over(
          w.rowsBetween(-5, 5)))
        .withColumn("dnum", expr("24 * y - (l6 + 2 * s11 + f6)"))
        .scopedPersist() // consumers: seasonal means + output join
      val s0 = det.filter(col("dnum").isNotNull)
        .groupBy(col("prio"), col("moy"))
        .agg(count(lit(1)).as("cnt"), sum(col("dnum")).as("sdnum"))
        .withColumn("s_raw",
          expr("CAST(sdnum AS DOUBLE) / (24.0 * cnt)"))
      val ctr = s0.groupBy(col("prio"))
        .agg(sum(expr("CAST(ROUND(s_raw, 12) AS DECIMAL(24,12))"))
          .as("ssum"), count(lit(1)).as("cm"))
        .withColumn("adj", expr("CAST(ssum AS DOUBLE) / cm"))
        .select(col("prio"), col("adj"))
      val seas = s0.join(broadcast(ctr), "prio")
        .select(col("prio"), col("moy"),
          expr("s_raw - adj").as("seasonal"))
      det.join(broadcast(seas), Seq("prio", "moy"), "left")
        .select(col("prio"), col("ym").as("month"), col("y"),
          expr("ROUND(CAST(l6 + 2 * s11 + f6 AS DOUBLE) / 24.0, 6)")
            .as("trend"),
          round(col("seasonal"), 6).as("seasonal"),
          expr("ROUND(CAST(dnum AS DOUBLE) / 24.0 - seasonal, 6)")
            .as("residual"))
        .orderBy(col("prio"), col("month"))
    }
  )

  val oracleSql: Map[String, String] = Map(

    "q268_kaplan_meier" ->
      """WITH life AS (SELECT o_custkey,
        |    MIN(CAST(o_orderdate AS DATE)) AS first_d,
        |    MAX(CAST(o_orderdate AS DATE)) AS last_d
        |  FROM orders GROUP BY o_custkey),
        |hor AS (SELECT MAX(last_d) AS horizon FROM life),
        |byt AS (SELECT date_diff('day', first_d, last_d) AS t,
        |    CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(CASE WHEN last_d <= horizon - 90 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS dd
        |  FROM life CROSS JOIN hor GROUP BY 1),
        |tot AS (SELECT CAST(SUM(m) AS BIGINT) AS nn FROM byt),
        |r AS (SELECT t, m, dd,
        |    CAST(nn - COALESCE(SUM(m) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS at_risk
        |  FROM byt CROSS JOIN tot),
        |r2 AS (SELECT t, m, dd, at_risk,
        |    CASE WHEN dd < at_risk
        |      THEN ln(1.0 - CAST(dd AS DOUBLE) / at_risk) ELSE 0.0 END
        |      AS lnterm,
        |    MAX(CASE WHEN dd = at_risk THEN 1 ELSE 0 END) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        |  FROM r),
        |r3 AS (SELECT t, m, dd, at_risk, dead,
        |    SUM(lnterm) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lncum
        |  FROM r2)
        |SELECT CAST(t AS BIGINT) AS duration_days, at_risk,
        |  dd AS n_events, m - dd AS n_censored,
        |  CASE WHEN dead > 0 THEN 0.0 ELSE ROUND(EXP(lncum), 6) END
        |    AS survival
        |FROM r3 WHERE dd > 0 ORDER BY duration_days""".stripMargin,

    "q269_chi2_independence" ->
      """WITH cells AS (SELECT c_mktsegment AS seg, o_orderpriority AS prio,
        |    CAST(COUNT(*) AS BIGINT) AS obs
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rowm AS (SELECT seg, CAST(SUM(obs) AS BIGINT) AS rt
        |  FROM cells GROUP BY seg),
        |colm AS (SELECT prio, CAST(SUM(obs) AS BIGINT) AS ct
        |  FROM cells GROUP BY prio),
        |tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n,
        |    (COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT prio) - 1) AS dof
        |  FROM cells),
        |b AS (SELECT seg, prio, obs,
        |    CAST(rt * ct AS DOUBLE) / n AS ex, dof
        |  FROM cells JOIN rowm USING (seg) JOIN colm USING (prio)
        |  CROSS JOIN tot),
        |b2 AS (SELECT seg, prio, obs, ex, dof,
        |    pow(obs - ex, 2.0) / ex AS term FROM b)
        |SELECT seg, prio, obs, ROUND(ex, 6) AS expected,
        |  ROUND(term, 6) AS chi2_term,
        |  ROUND(SUM(term) OVER (ORDER BY seg, prio
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS chi2_cum,
        |  dof
        |FROM b2 ORDER BY seg, prio""".stripMargin,

    "q270_spearman" ->
      """WITH vc AS (SELECT l_returnflag AS rf, l_quantity AS x,
        |    l_discount AS y, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2, 3),
        |xd0 AS (SELECT rf, x, CAST(SUM(c) AS BIGINT) AS m
        |  FROM vc GROUP BY rf, x),
        |xd AS (SELECT rf, x, 2 * COALESCE(SUM(m) OVER (PARTITION BY rf
        |    ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) + m + 1 AS rx
        |  FROM xd0),
        |yd0 AS (SELECT rf, y, CAST(SUM(c) AS BIGINT) AS m
        |  FROM vc GROUP BY rf, y),
        |yd AS (SELECT rf, y, 2 * COALESCE(SUM(m) OVER (PARTITION BY rf
        |    ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) + m + 1 AS ry
        |  FROM yd0),
        |sums AS (SELECT rf, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(CAST(c AS HUGEINT) * rx) AS DECIMAL(38,0)) AS sx,
        |    CAST(SUM(CAST(c AS HUGEINT) * ry) AS DECIMAL(38,0)) AS sy,
        |    CAST(SUM(CAST(c AS HUGEINT) * rx * rx) AS DECIMAL(38,0)) AS sxx,
        |    CAST(SUM(CAST(c AS HUGEINT) * ry * ry) AS DECIMAL(38,0)) AS syy,
        |    CAST(SUM(CAST(c AS HUGEINT) * rx * ry) AS DECIMAL(38,0)) AS sxy
        |  FROM vc JOIN xd USING (rf, x) JOIN yd USING (rf, y)
        |  GROUP BY rf)
        |SELECT rf AS l_returnflag, n,
        |  ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |    * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
        |    AS rho
        |FROM sums ORDER BY l_returnflag""".stripMargin,

    "q271_ks_test" ->
      """WITH vc AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT)
        |    AS c
        |  FROM documents GROUP BY 1, 2),
        |dom0 AS (SELECT v, CAST(SUM(c) AS BIGINT) AS m FROM vc GROUP BY v),
        |dom AS (SELECT v, SUM(m) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
        |  FROM dom0),
        |srcs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
        |  FROM vc GROUP BY source),
        |nn AS (SELECT CAST(SUM(n_s) AS BIGINT) AS nn FROM srcs),
        |grid AS (SELECT d.v, d.cum_all, s.source, s.n_s,
        |    COALESCE(vc.c, 0) AS c0
        |  FROM dom d CROSS JOIN srcs s
        |  LEFT JOIN vc ON vc.source = s.source AND vc.v = d.v),
        |g2 AS (SELECT source, n_s, cum_all,
        |    SUM(c0) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s
        |  FROM grid),
        |g3 AS (SELECT source, n_s, nn,
        |    ABS(cum_s * (nn - n_s) - (cum_all - cum_s) * n_s) AS gap
        |  FROM g2 CROSS JOIN nn),
        |mx AS (SELECT source, n_s, nn, CAST(MAX(gap) AS BIGINT) AS gmax
        |  FROM g3 GROUP BY source, n_s, nn)
        |SELECT source, n_s,
        |  ROUND(CAST(gmax AS DOUBLE) / (n_s * (nn - n_s)), 6) AS d_stat,
        |  ROUND(CAST(gmax AS DOUBLE) / (n_s * (nn - n_s))
        |    * sqrt(CAST(n_s AS DOUBLE) * (nn - n_s) / nn), 6) AS ks_z
        |FROM mx ORDER BY source""".stripMargin,

    "q272_cusum" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) * 100
        |      AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(rc) AS BIGINT) AS trc FROM daily),
        |b AS (SELECT day, rc, rc * nd - trc AS dev, nd
        |  FROM daily CROSS JOIN tot),
        |b2 AS (SELECT day, rc, nd,
        |    SUM(dev) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM b),
        |b3 AS (SELECT day, rc, nd,
        |    cum - MIN(cum) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_pos
        |  FROM b2),
        |b4 AS (SELECT day, rc, nd, s_pos,
        |    MAX(s_pos) OVER () AS peak FROM b3)
        |SELECT CAST(day AS TIMESTAMP) AS day,
        |  CAST(rc AS DOUBLE) / 100 AS revenue,
        |  ROUND(CAST(s_pos AS DOUBLE) / nd / 100, 6) AS cusum,
        |  CASE WHEN s_pos = peak THEN 1 ELSE 0 END AS is_changepoint
        |FROM b4 ORDER BY day""".stripMargin,

    "q273_rfm" ->
      """WITH cust AS (SELECT o_custkey,
        |    MAX(CAST(o_orderdate AS DATE)) AS last_d,
        |    CAST(COUNT(*) AS BIGINT) AS freq,
        |    SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS mon
        |  FROM orders GROUP BY o_custkey),
        |hor AS (SELECT MAX(last_d) AS mx FROM cust),
        |scored AS (SELECT o_custkey, freq, mon,
        |    date_diff('day', last_d, mx) AS rec
        |  FROM cust CROSS JOIN hor),
        |tiles AS (SELECT rec, freq, mon,
        |    CAST(NTILE(5) OVER (ORDER BY rec DESC, o_custkey) AS BIGINT)
        |      AS r,
        |    CAST(NTILE(5) OVER (ORDER BY freq, o_custkey) AS BIGINT) AS f,
        |    CAST(NTILE(5) OVER (ORDER BY mon, o_custkey) AS BIGINT) AS m
        |  FROM scored)
        |SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  ROUND(AVG(rec), 6) AS avg_recency_days,
        |  ROUND(CAST(SUM(mon) AS DOUBLE) / COUNT(*), 6) AS avg_monetary
        |FROM tiles GROUP BY r, f, m ORDER BY r, f, m""".stripMargin,

    "q274_seq_packing" ->
      """WITH toks AS (SELECT doc_id,
        |    GREATEST(1, (n_chars + 3) // 4) AS tok FROM documents),
        |cum AS (SELECT doc_id, tok,
        |    SUM(tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_weight
        |  FROM toks),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_total,
        |    CAST(SUM(tok) AS BIGINT) AS n_tok FROM cum),
        |spans AS (SELECT ((cum_weight - 1) // 2048)
        |    - ((cum_weight - tok) // 2048) + 1 AS span FROM cum),
        |g AS (SELECT CAST(span AS BIGINT) AS span,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs FROM spans GROUP BY 1)
        |SELECT span, n_docs,
        |  ROUND(CAST(n_docs AS DOUBLE) / n_docs_total, 6) AS frac,
        |  CAST((n_tok + 2047) // 2048 AS BIGINT) AS n_chunks
        |FROM g CROSS JOIN tot ORDER BY span""".stripMargin,

    "q275_acf" ->
      """WITH d0 AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0
        |  FROM orders),
        |daily AS (SELECT date_diff('day', d0, CAST(o_orderdate AS DATE))
        |    AS di, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM orders CROSS JOIN d0 GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
        |    CAST(SUM(c) AS BIGINT) AS tc FROM daily),
        |den AS (SELECT CAST(SUM((c * nd - tc) * (c * nd - tc)) AS BIGINT)
        |    AS den
        |  FROM daily CROSS JOIN tot),
        |lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, 15)),
        |pairs AS (SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM((x.c * nd - tc) * (y.c * nd - tc)) AS BIGINT) AS num
        |  FROM daily x CROSS JOIN lags l
        |  JOIN daily y ON y.di = x.di + l.lag
        |  CROSS JOIN tot GROUP BY l.lag)
        |SELECT lag, n_pairs,
        |  ROUND(CAST(num AS DOUBLE) / den, 6) AS acf
        |FROM pairs CROSS JOIN den ORDER BY lag""".stripMargin,

    "q276_seq_containment" ->
      """WITH ut AS (SELECT user_id, event_type,
        |    CAST(MIN(epoch_us(ts)) AS BIGINT) AS tmin,
        |    CAST(MAX(epoch_us(ts)) AS BIGINT) AS tmax
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    a.tmin, b.tmax
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type)
        |SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_both,
        |  CAST(SUM(CASE WHEN tmin < tmax THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_seq,
        |  ROUND(CAST(SUM(CASE WHEN tmin < tmax THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*), 6) AS containment
        |FROM p GROUP BY type_a, type_b ORDER BY type_a, type_b""".stripMargin,

    "q277_pareto_abc" ->
      """WITH rev AS (SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,2))
        |        - CAST(l_discount AS DECIMAL(18,2)))) * 10000
        |      AS BIGINT) AS rc
        |  FROM lineitem GROUP BY l_partkey),
        |ranked AS (SELECT l_partkey, rc,
        |    SUM(rc) OVER (ORDER BY rc DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_weight
        |  FROM rev),
        |tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS trc,
        |    CAST(COUNT(*) AS BIGINT) AS np FROM ranked),
        |cls AS (SELECT CASE WHEN cum_weight * 100 <= trc * 80 THEN 'A'
        |      WHEN cum_weight * 100 <= trc * 95 THEN 'B'
        |      ELSE 'C' END AS cls, rc
        |  FROM ranked CROSS JOIN tot),
        |g AS (SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |    CAST(SUM(rc) AS BIGINT) AS crc FROM cls GROUP BY cls)
        |SELECT cls, n_parts,
        |  ROUND(CAST(crc AS DOUBLE) / 10000, 2) AS revenue,
        |  ROUND(CAST(crc AS DOUBLE) / trc, 6) AS rev_share,
        |  ROUND(CAST(n_parts AS DOUBLE) / np, 6) AS part_share
        |FROM g CROSS JOIN tot ORDER BY cls""".stripMargin,

    "q278_ewma" ->
      """WITH d0 AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0
        |  FROM orders),
        |daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    date_diff('day', d0, CAST(o_orderdate AS DATE)) AS di,
        |    CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) * 100
        |      AS BIGINT) AS rc
        |  FROM orders CROSS JOIN d0 GROUP BY 1, 2),
        |lags AS (SELECT CAST(range AS BIGINT) AS lag,
        |    CAST(64 // power(2, range) AS BIGINT) AS w
        |  FROM range(0, 7)),
        |j AS (SELECT a.day, a.rc, l.w, b.rc AS rcj
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.di = a.di - l.lag),
        |g AS (SELECT day, rc, CAST(SUM(rcj * w) AS BIGINT) AS num,
        |    CAST(SUM(w) AS BIGINT) AS den
        |  FROM j GROUP BY day, rc)
        |SELECT CAST(day AS TIMESTAMP) AS day,
        |  CAST(rc AS DOUBLE) / 100 AS revenue,
        |  ROUND(CAST(num AS DOUBLE) / den / 100, 6) AS ewma7
        |FROM g ORDER BY day""".stripMargin,

    "q279_js_divergence" ->
      """WITH wt AS (SELECT (epoch_us(ts) // 86400000000) % 7 AS wd,
        |    event_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |wdtot AS (SELECT wd, CAST(SUM(c) AS BIGINT) AS nw
        |  FROM wt GROUP BY wd),
        |gtot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS ct
        |  FROM wt GROUP BY event_type),
        |nn AS (SELECT CAST(SUM(ct) AS BIGINT) AS n FROM gtot),
        |grid AS (SELECT w.wd, g.event_type, w.nw, g.ct,
        |    COALESCE(wt.c, 0) AS c0
        |  FROM wdtot w CROSS JOIN gtot g
        |  LEFT JOIN wt ON wt.wd = w.wd AND wt.event_type = g.event_type),
        |b AS (SELECT wd, event_type, c0,
        |    CAST(c0 AS DOUBLE) / nw AS p,
        |    CAST(ct AS DOUBLE) / n AS q
        |  FROM grid CROSS JOIN nn),
        |b2 AS (SELECT wd, event_type, c0, p, q,
        |    CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) / 2
        |      ELSE 0.0 END
        |    + q * ln(q / ((p + q) / 2)) / 2 AS term
        |  FROM b)
        |SELECT CAST(wd AS BIGINT) AS weekday, event_type,
        |  c0 AS n_events, ROUND(p, 6) AS p_weekday,
        |  ROUND(q, 6) AS p_global,
        |  ROUND(SUM(term) OVER (PARTITION BY wd ORDER BY event_type
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS jsd_cum
        |FROM b2 ORDER BY weekday, event_type""".stripMargin,

    "q280_diff_in_diff" ->
      """WITH ev AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat,
        |    epoch_us(ts) // 86400000000 AS dy,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value, 6) AS DECIMAL(18,6)) END AS pv
        |  FROM events),
        |mid AS (SELECT (MIN(dy) + MAX(dy)) // 2 AS mid FROM ev),
        |b AS (SELECT treat, dy > mid AS post, pv
        |  FROM ev CROSS JOIN mid WHERE pv IS NOT NULL)
        |SELECT
        |  CAST(SUM(CASE WHEN treat = 1 AND NOT post THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_t_pre,
        |  CAST(SUM(CASE WHEN treat = 1 AND post THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_t_post,
        |  CAST(SUM(CASE WHEN treat = 0 AND NOT post THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_c_pre,
        |  CAST(SUM(CASE WHEN treat = 0 AND post THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_c_post,
        |  ROUND(CAST(SUM(CASE WHEN treat = 1 AND NOT post THEN pv END)
        |      AS DOUBLE)
        |    / SUM(CASE WHEN treat = 1 AND NOT post THEN 1 ELSE 0 END), 6)
        |    AS mean_t_pre,
        |  ROUND(CAST(SUM(CASE WHEN treat = 1 AND post THEN pv END)
        |      AS DOUBLE)
        |    / SUM(CASE WHEN treat = 1 AND post THEN 1 ELSE 0 END), 6)
        |    AS mean_t_post,
        |  ROUND(CAST(SUM(CASE WHEN treat = 0 AND NOT post THEN pv END)
        |      AS DOUBLE)
        |    / SUM(CASE WHEN treat = 0 AND NOT post THEN 1 ELSE 0 END), 6)
        |    AS mean_c_pre,
        |  ROUND(CAST(SUM(CASE WHEN treat = 0 AND post THEN pv END)
        |      AS DOUBLE)
        |    / SUM(CASE WHEN treat = 0 AND post THEN 1 ELSE 0 END), 6)
        |    AS mean_c_post,
        |  ROUND((CAST(SUM(CASE WHEN treat = 1 AND post THEN pv END)
        |      AS DOUBLE)
        |    / SUM(CASE WHEN treat = 1 AND post THEN 1 ELSE 0 END)
        |    - CAST(SUM(CASE WHEN treat = 1 AND NOT post THEN pv END)
        |      AS DOUBLE)
        |    / SUM(CASE WHEN treat = 1 AND NOT post THEN 1 ELSE 0 END))
        |    - (CAST(SUM(CASE WHEN treat = 0 AND post THEN pv END)
        |      AS DOUBLE)
        |    / SUM(CASE WHEN treat = 0 AND post THEN 1 ELSE 0 END)
        |    - CAST(SUM(CASE WHEN treat = 0 AND NOT post THEN pv END)
        |      AS DOUBLE)
        |    / SUM(CASE WHEN treat = 0 AND NOT post THEN 1 ELSE 0 END)), 6)
        |    AS did
        |FROM b""".stripMargin,

    "q281_forecast_eval" ->
      """WITH d0 AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0
        |  FROM orders),
        |daily AS (SELECT date_diff('day', d0, CAST(o_orderdate AS DATE))
        |    AS di,
        |    CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) * 100
        |      AS BIGINT) // 100 AS rd
        |  FROM orders CROSS JOIN d0 GROUP BY 1),
        |j AS (SELECT a.di, a.rd, a.rd - b.rd AS e
        |  FROM daily a JOIN daily b ON a.di = b.di + 7),
        |c AS (SELECT di,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
        |    CAST(SUM(ABS(e)) OVER w AS BIGINT) AS sae,
        |    CAST(SUM(e * e) OVER w AS BIGINT) AS see,
        |    SUM(CAST(ABS(e) AS DOUBLE) / rd) OVER w AS cape,
        |    MAX(di) OVER () AS mx
        |  FROM j
        |  WINDOW w AS (ORDER BY di
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT n AS n_days,
        |  ROUND(CAST(sae AS DOUBLE) / n, 6) AS mae,
        |  ROUND(sqrt(CAST(see AS DOUBLE) / n), 6) AS rmse,
        |  ROUND(cape / n, 6) AS mape
        |FROM c WHERE di = mx""".stripMargin,

    "q282_dispersion" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS c FROM orders GROUP BY 1),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(c) AS BIGINT) AS tc,
        |    CAST(SUM(c * c) AS BIGINT) AS tcc FROM daily)
        |SELECT n_days,
        |  ROUND(CAST(tc AS DOUBLE) / n_days, 6) AS mean,
        |  ROUND(CAST(n_days * tcc - tc * tc AS DOUBLE)
        |    / (n_days * (n_days - 1)), 6) AS variance,
        |  ROUND(CAST(n_days * tcc - tc * tc AS DOUBLE)
        |    / ((n_days - 1) * tc), 6) AS dispersion,
        |  ROUND(CAST(n_days * tcc - tc * tc AS DOUBLE) / tc, 6) AS chi2
        |FROM t""".stripMargin,

    "q283_cross_correlation" ->
      """WITH d0 AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0
        |  FROM orders),
        |x AS (SELECT date_diff('day', d0, CAST(o_orderdate AS DATE))
        |    AS di,
        |    CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) * 100
        |      AS BIGINT) // 100 AS x
        |  FROM orders CROSS JOIN d0 GROUP BY 1),
        |y AS (SELECT date_diff('day', d0, CAST(l_shipdate AS DATE))
        |    AS dj, CAST(COUNT(*) AS BIGINT) AS y
        |  FROM lineitem CROSS JOIN d0 GROUP BY 1),
        |lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(-7, 8)),
        |m AS (SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(x.x) AS BIGINT) AS sx, CAST(SUM(y.y) AS BIGINT) AS sy,
        |    CAST(SUM(x.x * y.y) AS BIGINT) AS sxy,
        |    CAST(SUM(x.x * x.x) AS BIGINT) AS sxx,
        |    CAST(SUM(y.y * y.y) AS BIGINT) AS syy
        |  FROM x CROSS JOIN lags l JOIN y ON y.dj = x.di + l.lag
        |  GROUP BY l.lag)
        |SELECT lag, n_pairs,
        |  ROUND((CAST(n_pairs AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / (sqrt(CAST(n_pairs AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |    * sqrt(CAST(n_pairs AS DOUBLE) * syy
        |      - CAST(sy AS DOUBLE) * sy)), 6) AS ccf
        |FROM m ORDER BY lag""".stripMargin,

    "q284_trimmed_mean" ->
      """WITH vc0 AS (SELECT source, n_chars AS v,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM documents GROUP BY 1, 2),
        |vc AS (SELECT source, v, m,
        |    SUM(m) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM vc0),
        |tot AS (SELECT source, CAST(MAX(cum) AS BIGINT) AS n_s
        |  FROM vc GROUP BY source),
        |b AS (SELECT vc.source, v, m, cum, n_s,
        |    n_s // 10 AS lo, n_s - n_s // 10 AS hi
        |  FROM vc JOIN tot ON vc.source = tot.source),
        |b2 AS (SELECT source, v, m, n_s, hi - lo AS nt,
        |    GREATEST(0, LEAST(cum, hi) - GREATEST(cum - m, lo)) AS kept
        |  FROM b),
        |g AS (SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
        |    CAST(SUM(v * m) AS BIGINT) AS sv,
        |    CAST(SUM(v * kept) AS BIGINT) AS svt,
        |    CAST(MAX(nt) AS BIGINT) AS nt
        |  FROM b2 GROUP BY source)
        |SELECT source, n_docs,
        |  ROUND(CAST(sv AS DOUBLE) / n_docs, 6) AS mean,
        |  ROUND(CAST(svt AS DOUBLE) / nt, 6) AS trimmed_mean
        |FROM g ORDER BY source""".stripMargin,

    "q285_mad" ->
      """WITH vc0 AS (SELECT source, n_chars AS v,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM documents GROUP BY 1, 2),
        |vc AS (SELECT source, v, m,
        |    SUM(m) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM vc0),
        |tot AS (SELECT source, CAST(MAX(cum) AS BIGINT) AS n_s
        |  FROM vc GROUP BY source),
        |med AS (SELECT vc.source, CAST(MIN(v) AS BIGINT) AS median,
        |    CAST(MAX(n_s) AS BIGINT) AS n_s
        |  FROM vc JOIN tot ON vc.source = tot.source
        |  WHERE cum * 2 >= n_s GROUP BY vc.source),
        |dv AS (SELECT vc.source, ABS(v - median) AS dev,
        |    CAST(SUM(m) AS BIGINT) AS dm,
        |    CAST(MAX(median) AS BIGINT) AS median,
        |    CAST(MAX(n_s) AS BIGINT) AS n_s
        |  FROM vc JOIN med ON vc.source = med.source
        |  GROUP BY vc.source, ABS(v - median)),
        |dc AS (SELECT source, dev, median, n_s,
        |    SUM(dm) OVER (PARTITION BY source ORDER BY dev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumd
        |  FROM dv)
        |SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
        |  CAST(MAX(median) AS BIGINT) AS median,
        |  CAST(MIN(dev) AS BIGINT) AS mad
        |FROM dc WHERE cumd * 2 >= n_s
        |GROUP BY source ORDER BY source""".stripMargin,

    "q286_cumulative_uniques" ->
      """WITH ev AS (SELECT epoch_us(ts) // 86400000000 AS dy, user_id
        |  FROM events),
        |da AS (SELECT dy, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |    AS active_users
        |  FROM ev GROUP BY dy),
        |fs AS (SELECT user_id, MIN(dy) AS dy FROM ev GROUP BY user_id),
        |nu AS (SELECT dy, CAST(COUNT(*) AS BIGINT) AS new_users
        |  FROM fs GROUP BY dy),
        |j AS (SELECT da.dy, da.active_users,
        |    COALESCE(nu.new_users, 0) AS nu0
        |  FROM da LEFT JOIN nu ON da.dy = nu.dy)
        |SELECT CAST(dy AS BIGINT) AS day, active_users,
        |  nu0 AS new_users,
        |  active_users - nu0 AS returning_users,
        |  CAST(SUM(nu0) OVER (ORDER BY dy
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM j ORDER BY day""".stripMargin,

    "q287_fim_plan" ->
      """WITH base AS (SELECT source,
        |    GREATEST(1, (n_chars + 3) // 4) AS t,
        |    CAST(('0x' || substr(md5('q287:a:' || doc_id), 1, 12))
        |      AS BIGINT) AS h1,
        |    CAST(('0x' || substr(md5('q287:b:' || doc_id), 1, 12))
        |      AS BIGINT) AS h2
        |  FROM documents),
        |cuts AS (SELECT source, t,
        |    LEAST((h1 * t) // 281474976710656,
        |      (h2 * t) // 281474976710656) AS lo,
        |    GREATEST((h1 * t) // 281474976710656,
        |      (h2 * t) // 281474976710656) AS hi
        |  FROM base),
        |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(t) AS BIGINT) AS sum_tokens,
        |    CAST(SUM(lo) AS BIGINT) AS sp,
        |    CAST(SUM(hi - lo) AS BIGINT) AS sm,
        |    CAST(SUM(t - hi) AS BIGINT) AS ss,
        |    CAST(SUM(CASE WHEN hi = lo THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_empty_middle
        |  FROM cuts GROUP BY source)
        |SELECT source, n_docs, sum_tokens,
        |  ROUND(CAST(sp AS DOUBLE) / sum_tokens, 6) AS prefix_frac,
        |  ROUND(CAST(sm AS DOUBLE) / sum_tokens, 6) AS middle_frac,
        |  ROUND(CAST(ss AS DOUBLE) / sum_tokens, 6) AS suffix_frac,
        |  n_empty_middle
        |FROM g ORDER BY source""".stripMargin,

    "q288_seasonal_index" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) * 100
        |      AS BIGINT) AS rc
        |  FROM orders GROUP BY 1),
        |d2 AS (SELECT rc,
        |    date_diff('day', DATE '1970-01-01', day) % 7 AS wd
        |  FROM daily),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
        |    CAST(SUM(rc) AS BIGINT) AS tt FROM d2),
        |g AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(rc) AS BIGINT) AS sw FROM d2 GROUP BY wd)
        |SELECT CAST(wd AS BIGINT) AS weekday, n_days,
        |  ROUND(CAST(sw AS DOUBLE) / n_days / 100, 6) AS avg_revenue,
        |  ROUND(CAST(sw * nn AS DOUBLE) / (n_days * tt), 6)
        |    AS seasonal_index
        |FROM g CROSS JOIN tot ORDER BY weekday""".stripMargin,

    "q289_top_paths" ->
      """WITH rn AS (SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |paths AS (SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM rn WHERE rn <= 3 GROUP BY user_id),
        |g AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |  FROM paths GROUP BY path)
        |SELECT path, n_users FROM g
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    "q290_bot_score" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    CAST(epoch_us(ts) AS BIGINT) AS tsm FROM events),
        |burst AS (SELECT user_id, CAST(MAX(c) AS BIGINT) AS max_per_min
        |  FROM (SELECT user_id, tsm // 60000000 AS minute,
        |      CAST(COUNT(*) AS BIGINT) AS c
        |    FROM ev GROUP BY 1, 2) GROUP BY user_id),
        |gaps AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
        |    CAST(MIN(CASE WHEN prev IS NOT NULL THEN tsm - prev END)
        |      AS BIGINT) AS min_gap_us
        |  FROM (SELECT user_id, event_type, tsm,
        |      LAG(tsm, 1) OVER (PARTITION BY user_id
        |        ORDER BY tsm, event_id) AS prev
        |    FROM ev) GROUP BY user_id),
        |v AS (SELECT CASE WHEN max_per_min >= 5
        |      OR (min_gap_us IS NOT NULL AND min_gap_us < 1000000)
        |      THEN 'bot_like' ELSE 'human_like' END AS verdict,
        |    n_events, n_types
        |  FROM gaps JOIN burst USING (user_id))
        |SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(n_events) AS BIGINT) AS total_events,
        |  ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS avg_events,
        |  ROUND(CAST(SUM(n_types) AS DOUBLE) / COUNT(*), 6) AS avg_types
        |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin,

    "q291_fulfillment_lag" ->
      """WITH vc0 AS (SELECT o_orderpriority AS prio,
        |    date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) AS lag,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |vc AS (SELECT prio, lag, m,
        |    SUM(m) OVER (PARTITION BY prio ORDER BY lag
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM vc0),
        |tot AS (SELECT prio, CAST(MAX(cum) AS BIGINT) AS n
        |  FROM vc GROUP BY prio)
        |SELECT vc.prio, CAST(MAX(n) AS BIGINT) AS n_lineitems,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 50 THEN lag END) AS BIGINT)
        |    AS p50,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 90 THEN lag END) AS BIGINT)
        |    AS p90,
        |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN lag END) AS BIGINT)
        |    AS p99,
        |  CAST(MAX(lag) AS BIGINT) AS max_lag
        |FROM vc JOIN tot ON vc.prio = tot.prio
        |GROUP BY vc.prio ORDER BY vc.prio""".stripMargin,

    "q292_price_index" ->
      """WITH mp AS (SELECT year(CAST(l_shipdate AS DATE)) * 100
        |      + month(CAST(l_shipdate AS DATE)) AS ym,
        |    l_partkey AS pk,
        |    CAST(SUM(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2)))
        |      * 100 AS BIGINT) AS e,
        |    CAST(SUM(l_quantity) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |base AS (SELECT MIN(ym) AS ym0 FROM mp),
        |basket AS (SELECT pk, e AS e0, q AS q0
        |  FROM mp JOIN base ON ym = ym0),
        |j AS (SELECT ym, mp.pk,
        |    CAST(e AS DOUBLE) / q * q0 AS num,
        |    CAST(e0 AS DOUBLE) / q0 * q0 AS den
        |  FROM mp JOIN basket ON mp.pk = basket.pk),
        |c AS (SELECT ym, pk,
        |    SUM(num) OVER w AS cnum, SUM(den) OVER w AS cden,
        |    CAST(COUNT(*) OVER (PARTITION BY ym) AS BIGINT) AS np,
        |    ROW_NUMBER() OVER (PARTITION BY ym ORDER BY pk DESC) AS rn
        |  FROM j
        |  WINDOW w AS (PARTITION BY ym ORDER BY pk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT CAST(ym AS BIGINT) AS month, np AS n_parts,
        |  ROUND(cnum / cden, 6) AS laspeyres_index
        |FROM c WHERE rn = 1 ORDER BY month""".stripMargin,

    "q293_split_gain" ->
      """WITH base AS (SELECT o_orderstatus AS label,
        |    c_mktsegment AS segment, o_orderpriority AS priority
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |lng AS (SELECT 'segment' AS f, segment AS v, label FROM base
        |  UNION ALL SELECT 'priority', priority, label FROM base),
        |nvl AS (SELECT f, v, label, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM lng GROUP BY 1, 2, 3),
        |nv AS (SELECT f, v, CAST(SUM(c) AS BIGINT) AS nv
        |  FROM nvl GROUP BY f, v),
        |nl AS (SELECT label, CAST(SUM(c) AS BIGINT) AS cl
        |  FROM nvl WHERE f = 'segment' GROUP BY label),
        |nn AS (SELECT CAST(SUM(cl) AS BIGINT) AS n FROM nl),
        |hb0 AS (SELECT label,
        |    (CAST(cl AS DOUBLE) / n) * ln(CAST(cl AS DOUBLE) / n) AS t
        |  FROM nl CROSS JOIN nn),
        |hb1 AS (SELECT SUM(t) OVER (ORDER BY label
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct,
        |    ROW_NUMBER() OVER (ORDER BY label DESC) AS rn0
        |  FROM hb0),
        |hb AS (SELECT -ct AS h_lbl FROM hb1 WHERE rn0 = 1),
        |hv0 AS (SELECT nvl.f, nvl.v, nv,
        |    (CAST(c AS DOUBLE) / nv) * ln(CAST(c AS DOUBLE) / nv) AS t,
        |    label
        |  FROM nvl JOIN nv ON nvl.f = nv.f AND nvl.v = nv.v),
        |hv1 AS (SELECT f, v, nv,
        |    SUM(t) OVER (PARTITION BY f, v ORDER BY label
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct,
        |    ROW_NUMBER() OVER (PARTITION BY f, v ORDER BY label DESC)
        |      AS rn
        |  FROM hv0),
        |hv AS (SELECT f, v, nv, -ct AS hv FROM hv1 WHERE rn = 1),
        |wt0 AS (SELECT f, v,
        |    (CAST(nv AS DOUBLE) / n) * hv AS wt
        |  FROM hv CROSS JOIN nn),
        |wt1 AS (SELECT f,
        |    SUM(wt) OVER (PARTITION BY f ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cwt,
        |    ROW_NUMBER() OVER (PARTITION BY f ORDER BY v DESC) AS rn2
        |  FROM wt0)
        |SELECT f AS feature, ROUND(h_lbl, 6) AS h_label,
        |  ROUND(cwt, 6) AS h_conditional,
        |  ROUND(h_lbl - cwt, 6) AS info_gain
        |FROM wt1 CROSS JOIN hb WHERE rn2 = 1 ORDER BY feature""".stripMargin,

    "q294_feature_snapshot" ->
      """WITH edge AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx
        |  FROM orders),
        |cust AS (SELECT o_custkey,
        |    CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) < mx - 180
        |      THEN 1 ELSE 0 END) AS BIGINT) AS past_orders,
        |    SUM(CASE WHEN CAST(o_orderdate AS DATE) < mx - 180
        |      THEN CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS past_spend,
        |    MAX(CASE WHEN CAST(o_orderdate AS DATE) < mx - 180
        |      THEN CAST(o_orderdate AS DATE) END) AS last_d,
        |    MAX(mx - 180) AS cutoff,
        |    CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) >= mx - 180
        |      AND CAST(o_orderdate AS DATE) < mx - 90
        |      THEN 1 ELSE 0 END) AS BIGINT) AS post_orders
        |  FROM orders CROSS JOIN edge GROUP BY o_custkey),
        |lab AS (SELECT CASE WHEN post_orders > 0 THEN 'retained'
        |      ELSE 'churned' END AS label,
        |    past_orders, past_spend,
        |    date_diff('day', last_d, cutoff) AS rec
        |  FROM cust WHERE past_orders > 0)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  ROUND(CAST(SUM(past_orders) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_past_orders,
        |  ROUND(CAST(SUM(past_spend) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_past_spend,
        |  ROUND(CAST(SUM(rec) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_recency_days
        |FROM lab GROUP BY label ORDER BY label""".stripMargin,

    "q295_vocab_curve" ->
      """WITH words AS (SELECT unnest(list_filter(string_split(
        |      regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' '),
        |      x -> x <> '')) AS word
        |  FROM documents),
        |vc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM words GROUP BY word),
        |r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word)
        |    AS cum_weight FROM vc)
        |SELECT CAST(SUM(c) AS BIGINT) AS total_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS vocab_size,
        |  ROUND(CAST(SUM(CASE WHEN cum_weight > 250 THEN c ELSE 0 END)
        |    AS DOUBLE) / SUM(c), 6) AS oov_250,
        |  ROUND(CAST(SUM(CASE WHEN cum_weight > 1000 THEN c ELSE 0 END)
        |    AS DOUBLE) / SUM(c), 6) AS oov_1000,
        |  ROUND(CAST(SUM(CASE WHEN cum_weight > 4000 THEN c ELSE 0 END)
        |    AS DOUBLE) / SUM(c), 6) AS oov_4000
        |FROM r""".stripMargin,

    "q296_ul2_mix" ->
      """WITH base AS (SELECT source,
        |    GREATEST(1, (n_chars + 3) // 4) AS t,
        |    CAST(('0x' || substr(md5('q296:' || doc_id), 1, 12))
        |      AS BIGINT) % 3 AS dz
        |  FROM documents),
        |p AS (SELECT source, t, dz,
        |    CASE WHEN dz = 0 THEN 'R' WHEN dz = 1 THEN 'S'
        |      ELSE 'X' END AS denoiser,
        |    CASE WHEN dz = 0 THEN GREATEST(1, t // 20)
        |      WHEN dz = 1 THEN 1
        |      ELSE GREATEST(1, t // 64) END AS n_spans
        |  FROM base),
        |p2 AS (SELECT source, denoiser, t, n_spans,
        |    CASE WHEN dz = 0 THEN LEAST(t - 1, n_spans * 3)
        |      WHEN dz = 1 THEN GREATEST(1, t // 4)
        |      ELSE LEAST(t - 1, n_spans * 32) END AS masked
        |  FROM p)
        |SELECT source, denoiser, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) AS sum_tokens,
        |  ROUND(CAST(SUM(masked) AS DOUBLE) / SUM(t), 6) AS mask_frac,
        |  ROUND(CAST(SUM(n_spans) AS DOUBLE) / COUNT(*), 6) AS avg_spans
        |FROM p2 GROUP BY source, denoiser
        |ORDER BY source, denoiser""".stripMargin,

    "q299_jackknife" ->
      """WITH per AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
        |    CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS cents_g
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
        |  CAST(SUM(cents_g) AS BIGINT) AS cc,
        |  CAST(COUNT(*) AS BIGINT) AS g FROM per),
        |loo AS (SELECT nk, n_g, nn, cc, g,
        |    CAST(cc - cents_g AS DOUBLE) / (nn - n_g) AS th_loo,
        |    CAST(ROUND(CAST(cc - cents_g AS DOUBLE) / (nn - n_g), 10)
        |      AS DECIMAL(28,10)) AS th_dec
        |  FROM per CROSS JOIN tot),
        |m1 AS (SELECT SUM(th_dec) AS s1 FROM loo),
        |dev AS (SELECT CAST(ROUND(pow(CAST(th_dec AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) / g, 2.0), 10) AS DECIMAL(28,10)) AS dv
        |  FROM loo CROSS JOIN m1),
        |sq AS (SELECT SUM(dv) AS ssq FROM dev)
        |SELECT nk, n_g AS n_orders, ROUND(th_loo, 6) AS theta_loo,
        |  ROUND(g * (CAST(cc AS DOUBLE) / nn) - (g - 1) * th_loo, 6)
        |    AS pseudo_value,
        |  ROUND(CAST(cc AS DOUBLE) / nn, 6) AS theta_hat,
        |  ROUND(CAST(s1 AS DOUBLE) / g, 6) AS jack_mean,
        |  ROUND(sqrt(CAST(g - 1 AS DOUBLE) / g * CAST(ssq AS DOUBLE)), 6)
        |    AS jack_se
        |FROM loo CROSS JOIN m1 CROSS JOIN sq ORDER BY nk""".stripMargin,

    "q300_theil" ->
      """WITH x AS (SELECT nk, x FROM (
        |    SELECT CAST(c_nationkey AS BIGINT) AS nk,
        |      CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS x
        |    FROM customer) WHERE x > 0),
        |per AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_g,
        |  CAST(SUM(x) AS BIGINT) AS sx_g FROM x GROUP BY nk),
        |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS nn,
        |  CAST(SUM(sx_g) AS BIGINT) AS sx FROM per),
        |rws AS (SELECT x.nk, x.x, per.n_g, per.sx_g,
        |    CAST(per.sx_g AS DOUBLE) / per.n_g AS mu_g,
        |    tot.nn, tot.sx, CAST(tot.sx AS DOUBLE) / tot.nn AS mu
        |  FROM x JOIN per ON x.nk = per.nk CROSS JOIN tot),
        |terms AS (SELECT nk, n_g, sx_g, mu_g, mu, sx, nn,
        |    CAST(ROUND(x / mu_g * ln(x / mu_g), 12)
        |      AS DECIMAL(28,12)) AS tg_dec,
        |    CAST(ROUND(x / mu * ln(x / mu), 12)
        |      AS DECIMAL(28,12)) AS tt_dec
        |  FROM rws),
        |ttot AS (SELECT SUM(tt_dec) AS t_sum FROM terms),
        |grp AS (SELECT nk, MAX(n_g) AS n_g, MAX(sx_g) AS sx_g,
        |    MAX(mu_g) AS mu_g, MAX(mu) AS mu, MAX(sx) AS sx,
        |    MAX(nn) AS nn, SUM(tg_dec) AS tg_sum
        |  FROM terms GROUP BY nk)
        |SELECT nk, n_g, ROUND(mu_g, 6) AS mean_cents,
        |  ROUND(CAST(tg_sum AS DOUBLE) / n_g, 6) AS theil_g,
        |  ROUND(CAST(sx_g AS DOUBLE) / sx, 6) AS share,
        |  ROUND(CAST(sx_g AS DOUBLE) / sx * ln(mu_g / mu), 6)
        |    AS between_term,
        |  ROUND(CAST(sx_g AS DOUBLE) / sx
        |    * (CAST(tg_sum AS DOUBLE) / n_g), 6) AS within_term,
        |  ROUND(CAST(t_sum AS DOUBLE) / nn, 6) AS theil_total
        |FROM grp CROSS JOIN ttot ORDER BY nk""".stripMargin,

    "q301_bh_fdr" -> {
      val p = graft.functions.PValues.twoSidedP("z6")
      s"""WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
         |    CAST(SUM(n_chars) AS BIGINT) AS sx,
         |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n,
         |  CAST(SUM(sx) AS BIGINT) AS tsx,
         |  CAST(SUM(sxx) AS BIGINT) AS tsxx FROM per),
         |b AS (SELECT source, n_s, n,
         |    CAST(sx AS DOUBLE) / n_s AS m1,
         |    CAST(tsx - sx AS DOUBLE) / (n - n_s) AS m2,
         |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
         |      / n_s) / (n_s - 1) AS v1,
         |    (CAST(tsxx - sxx AS DOUBLE) - CAST(tsx - sx AS DOUBLE)
         |      * CAST(tsx - sx AS DOUBLE) / (n - n_s)) / (n - n_s - 1) AS v2
         |  FROM per CROSS JOIN tot),
         |zt AS (SELECT source, n_s,
         |    ROUND((m1 - m2) / sqrt(v1 / n_s + v2 / (n - n_s)), 6) AS z6
         |  FROM b),
         |pt AS (SELECT source, n_s, z6, $p AS p,
         |    CAST((SELECT COUNT(*) FROM zt) AS BIGINT) AS m FROM zt),
         |rk AS (SELECT *, CAST(row_number() OVER (ORDER BY p, source)
         |    AS INTEGER) AS rank FROM pt),
         |th AS (SELECT *, CAST(rank AS DOUBLE) * 0.1 / m AS thr FROM rk),
         |kk AS (SELECT MAX(CASE WHEN p <= thr THEN rank ELSE 0 END) AS k
         |  FROM th)
         |SELECT source, n_s AS n_docs, z6 AS z, ROUND(p, 10) AS p_value,
         |  rank, ROUND(thr, 6) AS bh_threshold,
         |  CAST(CASE WHEN rank <= k THEN 1 ELSE 0 END AS INTEGER)
         |    AS is_discovery
         |FROM th CROSS JOIN kk ORDER BY rank""".stripMargin
    },

    "q302_holt" ->
      """WITH RECURSIVE m AS (SELECT o_orderpriority AS prio,
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
        |      AS ym,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT prio, ym, y, CAST(row_number() OVER (
        |    PARTITION BY prio ORDER BY ym) AS BIGINT) AS i FROM m),
        |rec AS (
        |  SELECT prio, i, ym, y, CAST(y AS DOUBLE) AS lvl,
        |    CAST(0.0 AS DOUBLE) AS tr
        |  FROM s WHERE i = 1
        |  UNION ALL
        |  SELECT s.prio, s.i, s.ym, s.y,
        |    0.5 * CAST(s.y AS DOUBLE) + 0.5 * (rec.lvl + rec.tr),
        |    0.3 * ((0.5 * CAST(s.y AS DOUBLE) + 0.5 * (rec.lvl + rec.tr))
        |      - rec.lvl) + 0.7 * rec.tr
        |  FROM rec JOIN s ON s.prio = rec.prio AND s.i = rec.i + 1)
        |SELECT prio, ym AS month, y, ROUND(lvl, 6) AS level,
        |  ROUND(tr, 6) AS trend, ROUND(lvl + tr, 6) AS forecast_next
        |FROM rec ORDER BY prio, month""".stripMargin,

    "q303_quantile_normalize" ->
      """WITH vc AS (SELECT source, n_chars AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |dom AS (SELECT v, CAST(SUM(c) AS BIGINT) AS m FROM vc GROUP BY v),
        |dcm AS (SELECT v, m, CAST(SUM(m) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cm FROM dom),
        |nt AS (SELECT MAX(cm) AS nn FROM dcm),
        |pool AS (SELECT CAST(NULL AS VARCHAR) AS source, v,
        |    CAST(NULL AS BIGINT) AS c,
        |    CAST(cm AS DOUBLE) / nn AS share, 1 AS is_pool, v AS pv
        |  FROM dcm CROSS JOIN nt),
        |ps AS (SELECT source, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      / CAST(SUM(c) OVER (PARTITION BY source) AS DOUBLE) AS share,
        |    0 AS is_pool, CAST(NULL AS BIGINT) AS pv FROM vc),
        |u AS (SELECT * FROM ps UNION ALL SELECT * FROM pool),
        |w AS (SELECT *, MIN(pv) OVER (ORDER BY share, is_pool
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_norm
        |  FROM u)
        |SELECT source, v AS n_chars, c AS n_docs,
        |  ROUND(share, 6) AS source_cdf, v_norm
        |FROM w WHERE is_pool = 0 ORDER BY source, n_chars""".stripMargin,

    "q304_fleiss_kappa" ->
      """WITH r AS (SELECT
        |    CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END AS r1,
        |    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1
        |      >= 60 THEN 1 ELSE 0 END AS r2,
        |    CASE WHEN length(text) < 8 * (length(text)
        |      - length(replace(text, ' ', '')) + 1) THEN 1 ELSE 0 END AS r3
        |  FROM documents),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(r1) AS BIGINT) AS keep_r1,
        |    CAST(SUM(r2) AS BIGINT) AS keep_r2,
        |    CAST(SUM(r3) AS BIGINT) AS keep_r3,
        |    CAST(SUM(r1 + r2 + r3) AS BIGINT) AS sk,
        |    CAST(SUM((r1 + r2 + r3) * (r1 + r2 + r3)
        |      + (3 - (r1 + r2 + r3)) * (3 - (r1 + r2 + r3)) - 3)
        |      AS BIGINT) AS sagree
        |  FROM r)
        |SELECT n_docs, keep_r1, keep_r2, keep_r3,
        |  ROUND(CAST(sagree AS DOUBLE) / (n_docs * 6), 6) AS p_bar,
        |  ROUND(CAST(sk AS DOUBLE) / (3 * n_docs), 6) AS p_keep,
        |  ROUND(pow(CAST(sk AS DOUBLE) / (3 * n_docs), 2.0)
        |    + pow(1.0 - CAST(sk AS DOUBLE) / (3 * n_docs), 2.0), 6) AS p_e,
        |  ROUND((CAST(sagree AS DOUBLE) / (n_docs * 6)
        |    - (pow(CAST(sk AS DOUBLE) / (3 * n_docs), 2.0)
        |      + pow(1.0 - CAST(sk AS DOUBLE) / (3 * n_docs), 2.0)))
        |    / (1.0 - (pow(CAST(sk AS DOUBLE) / (3 * n_docs), 2.0)
        |      + pow(1.0 - CAST(sk AS DOUBLE) / (3 * n_docs), 2.0))), 6)
        |    AS fleiss_kappa
        |FROM a""".stripMargin,

    "q305_cliffs_delta" ->
      """WITH vc AS (SELECT source, n_chars AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |dom AS (SELECT v, CAST(SUM(c) AS BIGINT) AS m FROM vc GROUP BY v),
        |dcb AS (SELECT v, m, CAST(COALESCE(SUM(m) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cb FROM dom),
        |tot AS (SELECT CAST(SUM(m) AS BIGINT) AS nn FROM dom),
        |ps AS (SELECT source, v, c,
        |    CAST(COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS sb,
        |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_s
        |  FROM vc),
        |j AS (SELECT ps.source, ps.c, ps.n_s, d.m, t.nn,
        |    d.cb - ps.sb AS rb,
        |    (t.nn - d.cb - d.m) - (ps.n_s - ps.sb - ps.c) AS ra
        |  FROM ps JOIN dcb d USING (v) CROSS JOIN tot t),
        |g AS (SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_s,
        |    CAST(MAX(nn) AS BIGINT) AS nn,
        |    CAST(SUM(CAST(c AS HUGEINT) * rb) AS DECIMAL(38,0)) AS wins,
        |    CAST(SUM(CAST(c AS HUGEINT) * ra) AS DECIMAL(38,0)) AS losses,
        |    CAST(SUM(CAST(c AS HUGEINT) * (m - c)) AS DECIMAL(38,0)) AS ties
        |  FROM j GROUP BY source)
        |SELECT source, n_s, nn - n_s AS n_rest,
        |  CAST(wins AS BIGINT) AS wins, CAST(losses AS BIGINT) AS losses,
        |  CAST(ties AS BIGINT) AS ties,
        |  ROUND(CAST(wins - losses AS DOUBLE)
        |    / (CAST(n_s AS DECIMAL(38,0)) * (nn - n_s)), 6)
        |    AS cliffs_delta
        |FROM g ORDER BY source""".stripMargin,

    "q306_cramers_v" ->
      """WITH ct AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |rm AS (SELECT source, CAST(SUM(o) AS BIGINT) AS rs
        |  FROM ct GROUP BY source),
        |cm AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS cs
        |  FROM ct GROUP BY lang),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS r,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS cc FROM ct),
        |cells AS (SELECT n, r, cc,
        |    CAST(ROUND(pow(o - CAST(rs AS DOUBLE) * cs / n, 2.0)
        |      / (CAST(rs AS DOUBLE) * cs / n), 12) AS DECIMAL(28,12))
        |      AS term
        |  FROM ct JOIN rm USING (source) JOIN cm USING (lang)
        |  CROSS JOIN tot),
        |ag AS (SELECT MAX(n) AS n, MAX(r) AS r, MAX(cc) AS c,
        |  SUM(term) AS chi2d FROM cells)
        |SELECT n, r, c, ROUND(CAST(chi2d AS DOUBLE), 6) AS chi2,
        |  ROUND(sqrt(CAST(chi2d AS DOUBLE)
        |    / (n * least(r - 1, c - 1))), 6) AS cramers_v,
        |  ROUND(sqrt(greatest(0.0, CAST(chi2d AS DOUBLE) / n
        |    - CAST((r - 1) * (c - 1) AS DOUBLE) / (n - 1))
        |    / least(r - CAST((r - 1) * (r - 1) AS DOUBLE) / (n - 1)
        |    - 1.0, c - CAST((c - 1) * (c - 1) AS DOUBLE) / (n - 1)
        |    - 1.0)), 6) AS cramers_v_bc
        |FROM ag""".stripMargin,

    "q307_cmh" -> {
      val p = graft.functions.PValues.twoSidedP("sqrt(chi2r)")
      s"""WITH per AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
         |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS r1,
         |    CAST(SUM(y) AS BIGINT) AS c1, CAST(SUM(x * y) AS BIGINT) AS a
         |  FROM (SELECT c_nationkey,
         |      CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |        THEN 1 ELSE 0 END AS x,
         |      CASE WHEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
         |        >= 15000000 THEN 1 ELSE 0 END AS y
         |    FROM orders JOIN customer ON o_custkey = c_custkey)
         |  GROUP BY 1 HAVING COUNT(*) >= 2),
         |q AS (SELECT *,
         |    CAST(ROUND(CAST(r1 AS DOUBLE) * c1 / n, 12)
         |      AS DECIMAL(28,12)) AS e_dec,
         |    CAST(ROUND(CAST(r1 AS DOUBLE) * (n - r1) * c1 * (n - c1)
         |      / (CAST(n AS DOUBLE) * n * (n - 1)), 12)
         |      AS DECIMAL(28,12)) AS v_dec
         |  FROM per),
         |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         |  CAST(SUM(a) AS BIGINT) AS sum_a, SUM(e_dec) AS se,
         |  SUM(v_dec) AS sv FROM q),
         |ch AS (SELECT *, ROUND(pow(sum_a - CAST(se AS DOUBLE), 2.0)
         |    / CAST(sv AS DOUBLE), 6) AS chi2r FROM ag)
         |SELECT n_strata, sum_a, ROUND(CAST(se AS DOUBLE), 6)
         |    AS sum_expected, chi2r AS chi2_cmh,
         |  ROUND($p, 10) AS p_value
         |FROM ch""".stripMargin
    },

    "q308_wilson_ci" ->
      """WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k_keep
        |  FROM documents GROUP BY source),
        |w AS (SELECT *, CAST(1.959964 AS DOUBLE) AS zz,
        |    CAST(k_keep AS DOUBLE) / n_docs AS ph FROM g),
        |w2 AS (SELECT *, 1.0 + zz * zz / n_docs AS dn FROM w),
        |w3 AS (SELECT *, (ph + zz * zz / (2.0 * n_docs)) / dn AS ctr,
        |    zz * sqrt(ph * (1.0 - ph) / n_docs
        |      + zz * zz / (4.0 * n_docs * n_docs)) / dn AS hw FROM w2)
        |SELECT source, n_docs, k_keep, ROUND(ph, 6) AS p_hat,
        |  ROUND(greatest(0.0, ctr - hw), 6) AS wilson_lo,
        |  ROUND(least(1.0, ctr + hw), 6) AS wilson_hi
        |FROM w3 ORDER BY source""".stripMargin,

    "q309_brier" ->
      """WITH rw AS (SELECT
        |    CAST(least(0.99, greatest(0.01, CAST(n_chars AS DOUBLE)
        |      / 1000)) AS DECIMAL(9,6)) AS p,
        |    CASE WHEN (CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END
        |      + CASE WHEN length(text) - length(replace(text, ' ', ''))
        |        + 1 >= 60 THEN 1 ELSE 0 END
        |      + CASE WHEN length(text) < 8 * (length(text)
        |        - length(replace(text, ' ', '')) + 1) THEN 1 ELSE 0 END)
        |      >= 2 THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |rb AS (SELECT p, y, least(9, CAST(floor(p * 10) AS INT)) AS bin
        |  FROM rw),
        |bins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b, SUM(p) AS sp,
        |    CAST(SUM(y) AS BIGINT) AS sy, SUM(p * p) AS spp,
        |    SUM(p * y) AS spy
        |  FROM rb GROUP BY bin),
        |tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS nn,
        |  CAST(SUM(sy) AS BIGINT) AS ty, SUM(spp) AS tpp,
        |  SUM(spy) AS tpy FROM bins),
        |terms AS (SELECT b.n_b, t.nn, t.ty, t.tpp, t.tpy,
        |    CAST(ROUND(b.n_b * pow(CAST(b.sp AS DOUBLE) / b.n_b
        |      - CAST(b.sy AS DOUBLE) / b.n_b, 2.0), 12)
        |      AS DECIMAL(28,12)) AS rel_dec,
        |    CAST(ROUND(b.n_b * pow(CAST(b.sy AS DOUBLE) / b.n_b
        |      - CAST(t.ty AS DOUBLE) / t.nn, 2.0), 12)
        |      AS DECIMAL(28,12)) AS res_dec,
        |    CAST(ROUND(CAST(b.spp AS DOUBLE) - CAST(b.sp AS DOUBLE)
        |      * CAST(b.sp AS DOUBLE) / b.n_b, 12)
        |      AS DECIMAL(28,12)) AS wbv_dec,
        |    CAST(ROUND(2.0 * (CAST(b.spy AS DOUBLE) - CAST(b.sp AS DOUBLE)
        |      * b.sy / b.n_b), 12) AS DECIMAL(28,12)) AS wbc_dec
        |  FROM bins b CROSS JOIN tot t),
        |ag AS (SELECT MAX(nn) AS nn, MAX(ty) AS ty, MAX(tpp) AS tpp,
        |  MAX(tpy) AS tpy, SUM(rel_dec) AS rel, SUM(res_dec) AS res,
        |  SUM(wbv_dec) AS wbv, SUM(wbc_dec) AS wbc
        |  FROM terms)
        |SELECT nn AS n_docs,
        |  ROUND((CAST(tpp AS DOUBLE) - 2.0 * CAST(tpy AS DOUBLE) + ty)
        |    / nn, 6) AS brier,
        |  ROUND(CAST(rel AS DOUBLE) / nn, 6) AS reliability,
        |  ROUND(CAST(res AS DOUBLE) / nn, 6) AS resolution,
        |  ROUND(CAST(ty AS DOUBLE) / nn
        |    * (1.0 - CAST(ty AS DOUBLE) / nn), 6) AS uncertainty,
        |  ROUND(CAST(wbv AS DOUBLE) / nn, 6) AS within_bin_var,
        |  ROUND(CAST(wbc AS DOUBLE) / nn, 6) AS within_bin_cov,
        |  ROUND(CAST(ty AS DOUBLE) / nn, 6) AS base_rate
        |FROM ag""".stripMargin,

    "q310_nelson_aalen" ->
      """WITH life AS (SELECT o_custkey,
        |    MIN(CAST(o_orderdate AS DATE)) AS first_d,
        |    MAX(CAST(o_orderdate AS DATE)) AS last_d
        |  FROM orders GROUP BY o_custkey),
        |hor AS (SELECT MAX(last_d) AS horizon FROM life),
        |byt AS (SELECT date_diff('day', first_d, last_d) AS t,
        |    CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(CASE WHEN last_d <= horizon - 90 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS dd
        |  FROM life CROSS JOIN hor GROUP BY 1),
        |tot AS (SELECT CAST(SUM(m) AS BIGINT) AS nn FROM byt),
        |r AS (SELECT t, m, dd,
        |    CAST(nn - COALESCE(SUM(m) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS at_risk
        |  FROM byt CROSS JOIN tot),
        |r2 AS (SELECT t, dd, at_risk,
        |    CAST(ROUND(CAST(dd AS DOUBLE) / at_risk, 12)
        |      AS DECIMAL(28,12)) AS h_dec,
        |    CAST(ROUND(CAST(dd AS DOUBLE)
        |      / (CAST(at_risk AS DOUBLE) * at_risk), 12)
        |      AS DECIMAL(28,12)) AS v_dec
        |  FROM r),
        |r3 AS (SELECT t, dd, at_risk,
        |    SUM(h_dec) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch,
        |    SUM(v_dec) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cv
        |  FROM r2)
        |SELECT CAST(t AS BIGINT) AS duration_days, at_risk,
        |  dd AS n_events, ROUND(CAST(ch AS DOUBLE), 6) AS cum_hazard,
        |  ROUND(exp(-CAST(ch AS DOUBLE)), 6) AS fh_survival,
        |  ROUND(CAST(cv AS DOUBLE), 6) AS hazard_var
        |FROM r3 WHERE dd > 0 ORDER BY duration_days""".stripMargin,

    "q311_log_rank" -> {
      val p = graft.functions.PValues.twoSidedP("sqrt(chi2r)")
      s"""WITH life AS (SELECT o_custkey,
         |    CASE WHEN MIN(c_mktsegment) = 'BUILDING' THEN 1 ELSE 0 END
         |      AS g,
         |    MIN(CAST(o_orderdate AS DATE)) AS first_d,
         |    MAX(CAST(o_orderdate AS DATE)) AS last_d
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY o_custkey),
         |hor AS (SELECT MAX(last_d) AS horizon FROM life),
         |bytg AS (SELECT date_diff('day', first_d, last_d) AS t, g,
         |    CAST(COUNT(*) AS BIGINT) AS m,
         |    CAST(SUM(CASE WHEN last_d <= horizon - 90 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS dd
         |  FROM life CROSS JOIN hor GROUP BY 1, 2),
         |grid AS (SELECT a.t, b.g FROM (SELECT DISTINCT t FROM bytg) a
         |  CROSS JOIN (SELECT DISTINCT g FROM bytg) b),
         |full0 AS (SELECT grid.t, grid.g, COALESCE(bytg.m, 0) AS m,
         |    COALESCE(bytg.dd, 0) AS dd
         |  FROM grid LEFT JOIN bytg ON grid.t = bytg.t
         |    AND grid.g = bytg.g),
         |full1 AS (SELECT t, g, m, dd,
         |    CAST(COALESCE(SUM(m) OVER (PARTITION BY g ORDER BY t
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cb,
         |    CAST(SUM(m) OVER (PARTITION BY g) AS BIGINT) AS n_g
         |  FROM full0),
         |full2 AS (SELECT *, n_g - cb AS ar FROM full1),
         |byt AS (SELECT t, CAST(SUM(dd) AS BIGINT) AS d,
         |    CAST(SUM(ar) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN g = 1 THEN dd ELSE 0 END) AS BIGINT) AS d1,
         |    CAST(SUM(CASE WHEN g = 1 THEN ar ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(MAX(CASE WHEN g = 1 THEN n_g ELSE 0 END) AS BIGINT)
         |      AS sz1,
         |    CAST(MAX(CASE WHEN g = 0 THEN n_g ELSE 0 END) AS BIGINT)
         |      AS sz0
         |  FROM full2 GROUP BY t
         |  HAVING SUM(dd) > 0 AND SUM(ar) > 1),
         |terms AS (SELECT *,
         |    CAST(ROUND(CAST(d AS DOUBLE) * n1 / n, 12)
         |      AS DECIMAL(28,12)) AS e_dec,
         |    CAST(ROUND(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n)
         |      * (1.0 - CAST(n1 AS DOUBLE) / n) * (n - d) / (n - 1), 12)
         |      AS DECIMAL(28,12)) AS v_dec
         |  FROM byt),
         |ag AS (SELECT CAST(MAX(sz1) AS BIGINT) AS n_group1,
         |  CAST(MAX(sz0) AS BIGINT) AS n_rest,
         |  CAST(SUM(d1) AS BIGINT) AS observed_1,
         |  SUM(e_dec) AS se, SUM(v_dec) AS sv FROM terms),
         |ch AS (SELECT *, ROUND(pow(observed_1 - CAST(se AS DOUBLE), 2.0)
         |    / CAST(sv AS DOUBLE), 6) AS chi2r FROM ag)
         |SELECT n_group1, n_rest, observed_1,
         |  ROUND(CAST(se AS DOUBLE), 6) AS expected_1,
         |  chi2r AS chi2_logrank, ROUND($p, 10) AS p_value
         |FROM ch""".stripMargin
    },

    "q312_lift_deciles" ->
      """WITH rw AS (SELECT
        |    CAST(least(0.99, greatest(0.01, CAST(n_chars AS DOUBLE)
        |      / 1000)) AS DECIMAL(9,6)) AS p,
        |    CASE WHEN (CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END
        |      + CASE WHEN length(text) - length(replace(text, ' ', ''))
        |        + 1 >= 60 THEN 1 ELSE 0 END
        |      + CASE WHEN length(text) < 8 * (length(text)
        |        - length(replace(text, ' ', '')) + 1) THEN 1 ELSE 0 END)
        |      >= 2 THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |vc AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(y) AS BIGINT) AS pos
        |  FROM rw GROUP BY p),
        |vb AS (SELECT *, CAST(COALESCE(SUM(n) OVER (ORDER BY p DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cb FROM vc),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |  CAST(SUM(pos) AS BIGINT) AS tp FROM vc),
        |dc AS (SELECT (cb * 10) // nn + 1 AS decile, n, pos, nn, tp
        |  FROM vb CROSS JOIN tot),
        |g AS (SELECT decile, CAST(MAX(nn) AS BIGINT) AS nn,
        |    CAST(MAX(tp) AS BIGINT) AS tp,
        |    CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(SUM(pos) AS BIGINT) AS n_pos
        |  FROM dc GROUP BY decile),
        |c AS (SELECT *, CAST(SUM(n_pos) OVER (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cpos,
        |    CAST(SUM(n_docs) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cn FROM g)
        |SELECT CAST(decile AS BIGINT) AS decile, n_docs, n_pos,
        |  ROUND(CAST(n_pos AS DOUBLE) / n_docs, 6) AS pos_rate,
        |  ROUND(CAST(cpos AS DOUBLE) / tp, 6) AS cum_capture,
        |  ROUND((CAST(cpos AS DOUBLE) / cn) / (CAST(tp AS DOUBLE) / nn), 6)
        |    AS cum_lift
        |FROM c ORDER BY decile""".stripMargin,

    "q314_srm_check" -> {
      val p = graft.functions.PValues.twoSidedP("sqrt(chi2r)")
      s"""WITH asg AS (SELECT c_custkey, e.experiment,
         |    CAST(('0x' || substr(md5(e.experiment || ':' || c_custkey),
         |      1, 12)) AS BIGINT) % 2 AS arm
         |  FROM customer CROSS JOIN (VALUES ('exp1'), ('exp2'), ('exp3'))
         |    e(experiment)),
         |g AS (SELECT experiment, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_arm1
         |  FROM asg GROUP BY experiment),
         |g2 AS (SELECT experiment, n, n - n_arm1 AS n_arm0, n_arm1
         |  FROM g),
         |g3 AS (SELECT *,
         |    ROUND(pow(n_arm1 - CAST(n AS DOUBLE) / 2, 2.0)
         |      / (CAST(n AS DOUBLE) / 2)
         |      + pow(n_arm0 - CAST(n AS DOUBLE) / 2, 2.0)
         |      / (CAST(n AS DOUBLE) / 2), 6) AS chi2r FROM g2),
         |g4 AS (SELECT *, ROUND($p, 10) AS p FROM g3)
         |SELECT experiment, n, n_arm0, n_arm1, chi2r AS chi2,
         |  p AS p_value,
         |  CAST(CASE WHEN p < 0.001 THEN 1 ELSE 0 END AS INT) AS srm_flag
         |FROM g4 ORDER BY experiment""".stripMargin
    },

    "q315_lorenz" ->
      """WITH vc AS (SELECT source, n_chars AS v,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2),
        |vb AS (SELECT *, v * n AS mass,
        |    CAST(COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb FROM vc),
        |tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(v * n) AS BIGINT) AS tm FROM vc GROUP BY source),
        |dc AS (SELECT vb.source, (cb * 10) // nn + 1 AS decile, n, mass,
        |    nn, tm
        |  FROM vb JOIN tot ON vb.source = tot.source),
        |g AS (SELECT source, decile, CAST(MAX(nn) AS BIGINT) AS nn,
        |    CAST(MAX(tm) AS BIGINT) AS tm,
        |    CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(SUM(mass) AS BIGINT) AS chars
        |  FROM dc GROUP BY source, decile),
        |c AS (SELECT *, CAST(SUM(n_docs) OVER (PARTITION BY source
        |      ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cn,
        |    CAST(SUM(chars) OVER (PARTITION BY source ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cm FROM g)
        |SELECT source, CAST(decile AS BIGINT) AS decile, n_docs, chars,
        |  ROUND(CAST(cn AS DOUBLE) / nn, 6) AS cum_pop_share,
        |  ROUND(CAST(cm AS DOUBLE) / tm, 6) AS cum_mass_share
        |FROM c ORDER BY source, decile""".stripMargin,

    "q318_kruskal_wallis" ->
      """WITH vc AS (SELECT source, n_chars AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |dom0 AS (SELECT v, CAST(SUM(c) AS BIGINT) AS m FROM vc GROUP BY v),
        |dom AS (SELECT v, m, CAST(COALESCE(SUM(m) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS cb FROM dom0),
        |dom2 AS (SELECT v, m, 2 * cb + m + 1 AS r2 FROM dom),
        |ties AS (SELECT CAST(SUM(m) AS BIGINT) AS nn,
        |  CAST(SUM(CAST(m AS HUGEINT) * m * m - m) AS DECIMAL(38,0)) AS tsum FROM dom2),
        |per AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s,
        |    CAST(SUM(CAST(c AS HUGEINT) * r2) AS DECIMAL(38,0)) AS r2_s
        |  FROM vc JOIN dom2 USING (v) GROUP BY source),
        |terms AS (SELECT n_s, r2_s, nn, tsum,
        |    CAST(ROUND(CAST(r2_s AS DOUBLE) * r2_s / (4.0 * n_s), 12)
        |      AS DECIMAL(38,12)) AS term
        |  FROM per CROSS JOIN ties),
        |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, MAX(nn) AS nn,
        |  MAX(tsum) AS tsum, SUM(term) AS sr FROM terms),
        |h0 AS (SELECT *, 12.0 / (CAST(nn AS DOUBLE) * (nn + 1))
        |    * CAST(sr AS DOUBLE) - 3.0 * (nn + 1) AS h FROM ag)
        |SELECT k AS n_groups, nn AS n_docs, k - 1 AS df,
        |  ROUND(h, 6) AS h_stat,
        |  ROUND(h / (1.0 - CAST(tsum AS DOUBLE)
        |    / (CAST(nn AS DOUBLE) * nn * nn - nn)), 6) AS h_tie_corrected
        |FROM h0""".stripMargin,

    "q319_anova_f" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS nn,
        |  CAST(SUM(sx) AS BIGINT) AS tsx,
        |  CAST(COUNT(*) AS BIGINT) AS k FROM per),
        |t AS (SELECT *,
        |    CAST(ROUND(n_s * pow(CAST(sx AS DOUBLE) / n_s
        |      - CAST(tsx AS DOUBLE) / nn, 2.0), 12)
        |      AS DECIMAL(38,12)) AS ssb_dec,
        |    CAST(ROUND(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx
        |      / n_s, 12) AS DECIMAL(38,12)) AS ssw_dec
        |  FROM per CROSS JOIN tot),
        |ag AS (SELECT MAX(k) AS k, MAX(nn) AS nn, SUM(ssb_dec) AS ssb,
        |  SUM(ssw_dec) AS ssw FROM t)
        |SELECT k AS n_groups, nn AS n_docs, k - 1 AS df_between,
        |  nn - k AS df_within,
        |  ROUND(CAST(ssb AS DOUBLE), 4) AS ss_between,
        |  ROUND(CAST(ssw AS DOUBLE), 4) AS ss_within,
        |  ROUND((CAST(ssb AS DOUBLE) / (k - 1))
        |    / (CAST(ssw AS DOUBLE) / (nn - k)), 6) AS f_stat,
        |  ROUND(CAST(ssb AS DOUBLE)
        |    / (CAST(ssb AS DOUBLE) + CAST(ssw AS DOUBLE)), 6)
        |    AS eta_squared
        |FROM ag""".stripMargin,

    "q320_brown_forsythe" ->
      """WITH vc AS (SELECT source, n_chars AS v,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |mm AS (SELECT source, v, c,
        |    CAST(SUM(c) OVER (PARTITION BY source ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_s
        |  FROM vc),
        |med AS (SELECT source, MIN(CASE WHEN cum * 2 >= n_s THEN v END)
        |    AS med FROM mm GROUP BY source),
        |dev AS (SELECT vc.source, CAST(SUM(c) AS BIGINT) AS n_s,
        |    CAST(SUM(c * abs(v - med)) AS BIGINT) AS sz,
        |    CAST(SUM(c * abs(v - med) * abs(v - med)) AS BIGINT) AS szz
        |  FROM vc JOIN med ON vc.source = med.source
        |  GROUP BY vc.source),
        |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS nn,
        |  CAST(SUM(sz) AS BIGINT) AS tsz, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM dev),
        |t AS (SELECT *,
        |    CAST(ROUND(n_s * pow(CAST(sz AS DOUBLE) / n_s
        |      - CAST(tsz AS DOUBLE) / nn, 2.0), 12)
        |      AS DECIMAL(38,12)) AS ssb_dec,
        |    CAST(ROUND(CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz
        |      / n_s, 12) AS DECIMAL(38,12)) AS ssw_dec
        |  FROM dev CROSS JOIN tot),
        |ag AS (SELECT MAX(k) AS k, MAX(nn) AS nn, SUM(ssb_dec) AS ssb,
        |  SUM(ssw_dec) AS ssw FROM t)
        |SELECT k AS n_groups, nn AS n_docs, k - 1 AS df_between,
        |  nn - k AS df_within,
        |  ROUND((CAST(ssb AS DOUBLE) / (k - 1))
        |    / (CAST(ssw AS DOUBLE) / (nn - k)), 6) AS f_stat
        |FROM ag""".stripMargin,

    "q321_tukey_pairs" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY source),
        |mw AS (SELECT CAST(SUM(CAST(ROUND(CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * sx / n_s, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE)
        |    / (CAST(SUM(n_s) AS BIGINT) - CAST(COUNT(*) AS BIGINT))
        |      AS msw
        |  FROM per),
        |pr AS (SELECT a.source AS source_a, b.source AS source_b,
        |    a.n_s AS n_a, b.n_s AS n_b,
        |    CAST(a.sx AS DOUBLE) / a.n_s
        |      - CAST(b.sx AS DOUBLE) / b.n_s AS diff,
        |    sqrt(mw.msw * (1.0 / a.n_s + 1.0 / b.n_s)) AS se
        |  FROM per a JOIN per b ON a.source < b.source CROSS JOIN mw)
        |SELECT source_a, source_b, n_a, n_b,
        |  ROUND(diff, 6) AS mean_diff, ROUND(se, 6) AS std_err,
        |  ROUND(diff / se, 6) AS t_stat
        |FROM pr ORDER BY source_a, source_b""".stripMargin,

    "q322_gumbel_evt" ->
      """WITH bm AS (SELECT o_orderpriority AS prio,
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
        |      AS ym,
        |    CAST(MAX(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS bm
        |  FROM orders GROUP BY 1, 2),
        |g AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(bm) AS BIGINT) AS s1,
        |    CAST(SUM(bm * bm) AS BIGINT) AS s2
        |  FROM bm GROUP BY prio),
        |g2 AS (SELECT *, CAST(s1 AS DOUBLE) / n_blocks AS mean,
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1
        |      / n_blocks) / (n_blocks - 1)) AS sd
        |  FROM g),
        |g3 AS (SELECT *, sd * sqrt(CAST(6.0 AS DOUBLE))
        |    / CAST(3.141592653589793 AS DOUBLE) AS beta FROM g2),
        |g4 AS (SELECT *, mean - CAST(0.5772156649015329 AS DOUBLE)
        |    * beta AS mu FROM g3)
        |SELECT prio, n_blocks, ROUND(mean, 6) AS mean_block_max,
        |  ROUND(sd, 6) AS sd_block_max, ROUND(mu, 6) AS gumbel_mu,
        |  ROUND(beta, 6) AS gumbel_beta,
        |  ROUND(mu - beta * ln(-ln(CAST(0.99 AS DOUBLE))), 6)
        |    AS p99_return_level
        |FROM g4 ORDER BY prio""".stripMargin,

    "q316_rater_pairs" -> {
      val p = graft.functions.PValues.twoSidedP("sqrt(chi2r)")
      s"""WITH r AS (SELECT
         |    CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END AS r1,
         |    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1
         |      >= 60 THEN 1 ELSE 0 END AS r2,
         |    CASE WHEN length(text) < 8 * (length(text)
         |      - length(replace(text, ' ', '')) + 1) THEN 1 ELSE 0 END
         |      AS r3
         |  FROM documents),
         |ag AS (SELECT
         |    CAST(SUM(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a12,
         |    CAST(SUM(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b12,
         |    CAST(SUM(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c12,
         |    CAST(SUM(CASE WHEN r1 = 0 AND r2 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d12,
         |    CAST(SUM(CASE WHEN r1 = 1 AND r3 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a13,
         |    CAST(SUM(CASE WHEN r1 = 1 AND r3 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b13,
         |    CAST(SUM(CASE WHEN r1 = 0 AND r3 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c13,
         |    CAST(SUM(CASE WHEN r1 = 0 AND r3 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d13,
         |    CAST(SUM(CASE WHEN r2 = 1 AND r3 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a23,
         |    CAST(SUM(CASE WHEN r2 = 1 AND r3 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS b23,
         |    CAST(SUM(CASE WHEN r2 = 0 AND r3 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c23,
         |    CAST(SUM(CASE WHEN r2 = 0 AND r3 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS d23
         |  FROM r),
         |u AS (SELECT 'r1_vs_r2' AS pair, a12 AS a, b12 AS b, c12 AS c,
         |    d12 AS d FROM ag
         |  UNION ALL SELECT 'r1_vs_r3', a13, b13, c13, d13 FROM ag
         |  UNION ALL SELECT 'r2_vs_r3', a23, b23, c23, d23 FROM ag),
         |u2 AS (SELECT *, a + b + c + d AS n FROM u),
         |u3 AS (SELECT *,
         |    CASE WHEN b + c = 0 THEN 0.0
         |      ELSE ROUND(pow(CAST(b - c AS DOUBLE), 2.0) / (b + c), 6)
         |      END AS chi2r,
         |    CAST(a + d AS DOUBLE) / n AS po,
         |    (CAST(a + b AS DOUBLE) / n) * (CAST(a + c AS DOUBLE) / n)
         |      + (CAST(c + d AS DOUBLE) / n) * (CAST(b + d AS DOUBLE) / n)
         |      AS pe
         |  FROM u2)
         |SELECT pair, a, b, c, d, chi2r AS chi2_mcnemar,
         |  ROUND($p, 10) AS p_value, ROUND(po, 6) AS agreement,
         |  ROUND((po - pe) / (1.0 - pe), 6) AS cohens_kappa
         |FROM u3 ORDER BY pair""".stripMargin
    },

    "q317_seasonal_decompose" ->
      """WITH m AS (SELECT o_orderpriority AS prio,
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
        |      AS ym,
        |    CAST(month(o_orderdate) AS BIGINT) AS moy,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2, 3),
        |t AS (SELECT *,
        |    lag(y, 6) OVER (PARTITION BY prio ORDER BY ym) AS l6,
        |    lead(y, 6) OVER (PARTITION BY prio ORDER BY ym) AS f6,
        |    CAST(SUM(y) OVER (PARTITION BY prio ORDER BY ym
        |      ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS BIGINT) AS s11
        |  FROM m),
        |t3 AS (SELECT *, 24 * y - (l6 + 2 * s11 + f6) AS dnum FROM t),
        |s0 AS (SELECT prio, moy, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(dnum) AS BIGINT) AS sdnum
        |  FROM t3 WHERE dnum IS NOT NULL GROUP BY prio, moy),
        |s1 AS (SELECT *, CAST(sdnum AS DOUBLE) / (24.0 * cnt) AS s_raw
        |  FROM s0),
        |ctr AS (SELECT prio, CAST(SUM(CAST(ROUND(s_raw, 12)
        |    AS DECIMAL(24,12))) AS DOUBLE) / COUNT(*) AS adj
        |  FROM s1 GROUP BY prio),
        |seas AS (SELECT s1.prio, s1.moy, s_raw - adj AS seasonal
        |  FROM s1 JOIN ctr ON s1.prio = ctr.prio)
        |SELECT t3.prio, ym AS month, y,
        |  ROUND(CAST(l6 + 2 * s11 + f6 AS DOUBLE) / 24.0, 6) AS trend,
        |  ROUND(seasonal, 6) AS seasonal,
        |  ROUND(CAST(dnum AS DOUBLE) / 24.0 - seasonal, 6) AS residual
        |FROM t3 LEFT JOIN seas ON t3.prio = seas.prio
        |  AND t3.moy = seas.moy
        |ORDER BY t3.prio, month""".stripMargin
  )
}
