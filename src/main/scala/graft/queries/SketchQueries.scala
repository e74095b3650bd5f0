package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY.md §2.3 addendum — sketch aggregates. At 100 TB, exact
  * count-distinct/percentile over high-cardinality keys is a full
  * shuffle of the key space; HLL++ / GK / KLL sketches are mergeable
  * map-side state of bounded size. Rows-only (DuckDB's approx
  * algorithms differ); QualitySpec / QuantileSketchSpec bound the
  * error vs exact.
  */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q46_sketch_agg" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_median_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // §2.5 (round 9) — native KLL-ladder quantile sketch as a custom
    // TypedImperativeAggregate: per-event-type value quantiles from
    // O(k·log n) mergeable state. The monitoring shape at 100 TB —
    // one scan, map-side partial sketches, k-sized shuffle rows —
    // where exact per-group quantiles (q53) pay a full sort. Rows-
    // only: estimates are sketch-algorithm-specific;
    // QuantileSketchSpec pins ≤2% rank error vs exact at k=200 and
    // the retained-size bound.
    "q161_kll_quantiles" -> { (s, d) =>
      val kll = graft.functions.KllQuantiles.kllQuantiles(
        col("value"), 200, Seq(0.1, 0.25, 0.5, 0.75, 0.9))
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(kll.as("sk"))
        .select(col("event_type"),
          col("sk.n").as("n"),
          col("sk.retained").as("retained"),
          round(col("sk.ests")(0)("est"), 6).as("p10"),
          round(col("sk.ests")(1)("est"), 6).as("p25"),
          round(col("sk.ests")(2)("est"), 6).as("p50"),
          round(col("sk.ests")(3)("est"), 6).as("p75"),
          round(col("sk.ests")(4)("est"), 6).as("p90"))
        .orderBy(col("event_type"))
    },

    // §2.5 (round 12) — count-min sketch point-frequency estimates
    // (functions/CountMin.scala): Space-Saving (q56) surfaces the
    // heavy keys; CMS answers "how often does THIS key occur" for
    // ANY key from depth×width mergeable counters — cell-wise-ADD
    // merge means map-side partials combine associatively and daily
    // sketches roll up to any window without rescanning. The query
    // builds one corpus-wide sketch (one aggregate, d·w·8 bytes of
    // state), broadcasts the bytes, and probes the exact top-20
    // tokens through the codegen'd estimator — est ≥ exact always
    // (one-sided error), with the overcount published per token.
    // Rows-only by design (no SQL-expressible oracle for the sketch
    // cells); QuantileSketchSpec pins est ≥ exact on a forced-
    // collision domain, additive merge ≡ single-pass build, and the
    // ε·N error bound.
    "q217_cms_freq" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      import graft.functions.{CmsFunctions, GraftFunctions}
      val depth = 4
      val width = 64
      val words = Tables.documents(s, d)
        .select(explode(GraftFunctions.normWords(col("text"))).as("word"))
        .scopedPersist() // consumers: sketch build + exact counts
      val sk = words.agg(
        CmsFunctions.cmsAgg(col("word"), lit(1L), depth, width).as("sk"))
      words.groupBy(col("word")).agg(count(lit(1)).as("exact"))
        .crossJoin(broadcast(sk)) // 1-row sketch frame
        .select(col("word"), col("exact"),
          CmsFunctions.cmsEstimate(col("sk"), col("word"), depth, width)
            .as("est"))
        .withColumn("overcount", col("est") - col("exact"))
        .orderBy(col("exact").desc, col("word"))
        .limit(20)
    },

    // §2.5 (round 13) — JOIN-SIZE ESTIMATION from CMS inner products
    // (Cormode–Muthukrishnan §4.2): |A ⋈ B| = Σ_k a_k·b_k, estimated
    // as min over rows of the cell-wise product of two SAME-DIMS
    // sketches. This is the join-planning primitive at 100 TB: each
    // side reduces to d·w·8 bytes with ONE map-side-combining
    // aggregate (no shuffle of the key space), the product is a
    // driver-sized broadcast op, and the answer is one-sided
    // (est ≥ true always — safe for "will this join explode?"
    // admission decisions, complementing q202's skew advisor). The
    // exact Σ ca·cb rides along as the audit column, same contract
    // as q217. Rows-only by design; QuantileSketchSpec pins
    // est ≥ exact and the (e/width)·Na·Nb error bound.
    "q224_join_size_est" -> { (s, d) =>
      import graft.functions.CmsFunctions
      val depth = 4
      val width = 256
      val a = Tables.events(s, d).select(col("user_id").cast("string").as("k"))
      val b = Tables.orders(s, d)
        .select(col("o_custkey").cast("string").as("k"))
      val skA = a.agg(CmsFunctions.cmsAgg(col("k"), lit(1L), depth, width)
        .as("ska"))
      val skB = b.agg(CmsFunctions.cmsAgg(col("k"), lit(1L), depth, width)
        .as("skb"))
      a.groupBy(col("k")).agg(count(lit(1)).as("ca"))
        .join(b.groupBy(col("k")).agg(count(lit(1)).as("cb")), "k")
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("exact_pairs"))
        .crossJoin(broadcast(skA)).crossJoin(broadcast(skB))
        .select(col("exact_pairs"),
          CmsFunctions.cmsInnerProduct(col("ska"), col("skb"), depth, width)
            .as("est_pairs"))
        .withColumn("overcount", col("est_pairs") - col("exact_pairs"))
        .withColumn("rel_err",
          round(col("overcount").cast("double") /
            greatest(lit(1L), col("exact_pairs")), 6))
    },

    // §2.5 (round 13) — KMV/THETA-SKETCH set operations
    // (functions/ThetaSketch.scala): the cross-source overlap-
    // CARDINALITY question ("how many distinct tokens do A and B
    // share?") that HLL cannot answer — HLL unions, KMV also
    // INTERSECTS. q124 answers it exactly with a distinct self-join
    // of the full shingle space; the sketch path reduces each source
    // to its k smallest token hashes (k·8 bytes, ONE map-side-
    // combining aggregate — the key space never shuffles), then every
    // pair estimate is a linear merge of two sorted k-arrays + one
    // IEEE division on a C(sources,2)-row frame. est_* relative error
    // is O(1/√k); exact distinct/∩/∪ ride along as audit columns
    // (the q217/q224 contract — at 100 TB the exact branch is the
    // query you no longer run). Rows-only by design; Round13Spec pins
    // the ≤15% relative-error bound at k=256 plus merge-order
    // invariance (sketch of union ≡ merged sketches).
    "q226_theta_overlap" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      import graft.functions.{GraftFunctions, KmvFunctions}
      val k = 256
      val words = Tables.documents(s, d)
        .select(col("source"),
          explode(GraftFunctions.normWords(col("text"))).as("w"))
        .distinct()
        .scopedPersist() // consumers: sketches + exact audit joins
      val sk = words.groupBy(col("source"))
        .agg(KmvFunctions.kmvAgg(col("w"), k).as("sk"),
          count(lit(1)).as("exact_distinct"))
      val inter = words.as("a")
        .join(words.as("b"),
          col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("exact_inter"))
      sk.as("x").join(sk.as("y"), col("x.source") < col("y.source"))
        .select(col("x.source").as("s1"), col("y.source").as("s2"),
          col("x.exact_distinct").as("exact_a"),
          col("y.exact_distinct").as("exact_b"),
          col("x.sk").as("ska"), col("y.sk").as("skb"))
        .join(inter, Seq("s1", "s2"), "left")
        .na.fill(0L, Seq("exact_inter"))
        .select(col("s1"), col("s2"), col("exact_a"), col("exact_b"),
          col("exact_inter"),
          (col("exact_a") + col("exact_b") - col("exact_inter"))
            .as("exact_union"),
          round(KmvFunctions.kmvEstimate(col("ska")), 2).as("est_a"),
          round(KmvFunctions.kmvEstimate(col("skb")), 2).as("est_b"),
          round(KmvFunctions.kmvIntersect(col("ska"), col("skb")), 2)
            .as("est_inter"),
          round(KmvFunctions.kmvUnion(col("ska"), col("skb")), 2)
            .as("est_union"),
          round(KmvFunctions.kmvJaccard(col("ska"), col("skb")), 6)
            .as("est_jaccard"))
        .orderBy(col("s1"), col("s2"))
    },

    // §2.3 (round 14) — ROLLING-WINDOW DISTINCT via Apache
    // DataSketches HLL (Spark 4's hll_sketch_agg/hll_union_agg): the
    // "7-day active users" class of metric. Exact rolling distinct
    // re-scans every window (each day's users shuffle once per window
    // they touch); the sketch path builds ONE day-sized sketch per
    // day (map-side-combining aggregate) and every window is a UNION
    // of the member sketches — day sketches roll up to ANY window
    // without touching raw data again, the mergeability contract that
    // pays for itself at 100 TB. 3-day windows over the 30-day events
    // table via a bounded day×offset expansion; exact rolling
    // distinct rides along as the audit column (the q217/q224/q226
    // contract). Rows-only by design (DataSketches internals have no
    // SQL oracle); Round14Spec pins relative error ≤ 4% per window
    // and day-merge ≡ direct-window-build consistency.
    "q257_rolling_hll" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val ev = Tables.events(s, d)
        .select((unix_micros(col("ts")) / lit(86400000000L)).cast("long")
          .as("day"), col("user_id"))
        .scopedPersist() // consumers: day sketches + exact audit
      val daySk = ev.groupBy(col("day"))
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      val offsets = ev.sparkSession.range(3).select(col("id").as("off"))
      val windowed = daySk.crossJoin(broadcast(offsets))
        .select((col("day") + col("off")).as("win_day"), col("sk"))
      val est = windowed.groupBy(col("win_day"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
          .cast("long").as("est_3d"),
          count(lit(1)).as("n_days"))
        .filter(col("n_days") === 3) // complete windows only
      val exact = ev.crossJoin(broadcast(offsets))
        .select((col("day") + col("off")).as("win_day"), col("user_id"))
        .groupBy(col("win_day"))
        .agg(countDistinct(col("user_id")).as("exact_3d"))
      est.join(exact, "win_day")
        .select(col("win_day"), col("exact_3d"), col("est_3d"),
          round(abs(col("est_3d") - col("exact_3d")).cast("double")
            / col("exact_3d"), 6).as("rel_err"))
        .orderBy(col("win_day"))
    }
  )

  val oracleSql: Map[String, String] = Map.empty
}
