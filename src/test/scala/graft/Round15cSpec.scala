package graft

import org.apache.spark.sql.functions._

/** Round-15 batch-3 invariants (effect sizes, stratified inference,
  * intervals, calibration decomposition): cross-QUERY identities
  * (Cliff's δ vs the independently-computed Mann–Whitney U), Scala
  * recomputations of CMH and Wilson, and the Murphy decomposition
  * identity — the math layer on top of the DuckDB parity gate.
  */
class Round15cSpec extends SparkSpecBase {

  test("q305: wins+losses+ties partitions all cross pairs; U cross-check") {
    val d305 = queries.StatsQueries.queries("q305_cliffs_delta")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6))).toMap
    val u260 = queries.OpsQueries.queries("q260_mann_whitney")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    d305.foreach { case (src, (ns, nr, w, l, t, delta)) =>
      assert(w + l + t == ns * nr, s"$src: pair partition broken")
      assert(delta >= -1.0 && delta <= 1.0)
      // the Mann–Whitney U from q260's midrank formulation must equal
      // wins + ties/2 from this query's value-domain formulation
      assert(math.abs(u260(src) - (w + t / 2.0)) < 1e-6,
        s"$src: U ${u260(src)} != wins+ties/2 ${w + t / 2.0}")
    }
  }

  test("q306: chi2 matches a Scala contingency recomputation; V bounds") {
    val r = queries.StatsQueries.queries("q306_cramers_v")(spark, sf)
      .collect()(0)
    val cells = Tables.documents(spark, sf)
      .groupBy(col("source"), col("lang")).count()
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    val n = cells.map(_._3).sum.toDouble
    val rowM = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colM = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val chi2 = cells.map { case (s0, l0, o) =>
      val e = rowM(s0) * colM(l0) / n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(r.getDouble(3) - chi2) < 1e-3,
      s"chi2 ${r.getDouble(3)} vs $chi2")
    val v = r.getDouble(4)
    assert(v >= 0.0 && v <= 1.0)
    assert(r.getDouble(5) <= v + 1e-9, "bias correction must shrink V")
  }

  test("q307: CMH chi2 matches a Scala per-stratum recomputation") {
    val out = queries.StatsQueries.queries("q307_cmh")(spark, sf)
      .collect()(0)
    val strata = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nk"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("x"),
        when(round(col("o_totalprice") * 100, 0).cast("long")
          >= 15000000L, 1L).otherwise(0L).as("y"))
      .groupBy("nk").agg(count(lit(1)).as("n"), sum("x").as("r1"),
        sum("y").as("c1"), sum(col("x") * col("y")).as("a"))
      .collect().filter(_.getLong(1) >= 2)
    val (sa, se, sv) = strata.foldLeft((0.0, 0.0, 0.0)) { case ((a, e, v), r) =>
      val (n, r1, c1, aa) = (r.getLong(1).toDouble, r.getLong(2).toDouble,
        r.getLong(3).toDouble, r.getLong(4).toDouble)
      (a + aa, e + r1 * c1 / n,
        v + r1 * (n - r1) * c1 * (n - c1) / (n * n * (n - 1)))
    }
    val chi2 = (sa - se) * (sa - se) / sv
    assert(math.abs(out.getDouble(3) - chi2) < 1e-3,
      s"cmh ${out.getDouble(3)} vs $chi2")
    val p = out.getDouble(4)
    assert(p >= 0.0 && p <= 1.0)
    // 1-df 5% boundary consistency between chi2 and its p-value
    if (chi2 > 3.85) assert(p < 0.05) else if (chi2 < 3.83) assert(p > 0.05)
  }

  test("q308: Wilson interval matches the closed form and brackets p-hat") {
    val rows = queries.StatsQueries.queries("q308_wilson_ci")(spark, sf)
      .collect()
    rows.foreach { r =>
      val (n, k) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val z = 1.959964
      val ph = k / n
      val dn = 1.0 + z * z / n
      val ctr = (ph + z * z / (2 * n)) / dn
      val hw = z * math.sqrt(ph * (1 - ph) / n + z * z / (4 * n * n)) / dn
      assert(math.abs(r.getDouble(4) - math.max(0.0, ctr - hw)) < 1e-5)
      assert(math.abs(r.getDouble(5) - math.min(1.0, ctr + hw)) < 1e-5)
      assert(r.getDouble(4) <= r.getDouble(3) + 1e-9 &&
        r.getDouble(3) <= r.getDouble(5) + 1e-9)
    }
  }

  test("q309: generalized Murphy identity BS = REL - RES + UNC + WBV - WBC") {
    val r = queries.StatsQueries.queries("q309_brier")(spark, sf)
      .collect()(0)
    val (bs, rel, res, unc, wbv, wbc) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))
    assert(math.abs(bs - (rel - res + unc + wbv - wbc)) < 1e-4,
      s"BS $bs != REL $rel - RES $res + UNC $unc + WBV $wbv - WBC $wbc")
    assert(bs >= 0.0 && rel >= 0.0 && res >= 0.0 && unc >= 0.0 &&
      unc <= 0.25 && wbv >= 0.0)
    assert(res <= unc + 1e-9, "between-bin label variance ≤ total variance")
  }

  test("q310: H nondecreasing; KM survival ≤ Fleming-Harrington exp(-H)") {
    val na = queries.StatsQueries.queries("q310_nelson_aalen")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(4))).toMap
    val km = queries.StatsQueries.queries("q268_kaplan_meier")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(4))).toMap
    assert(na.keySet == km.keySet, "same event-time support as KM")
    val hs = na.toSeq.sortBy(_._1).map(_._2._2)
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b + 1e-12 },
      "cumulative hazard must be nondecreasing")
    na.foreach { case (t, (ar, _, fh)) =>
      assert(ar == km(t)._1, s"at-risk mismatch vs KM at t=$t")
      // 1-x ≤ e^-x termwise ⇒ product-limit ≤ exp(-H)
      assert(km(t)._2 <= fh + 1e-6, s"KM > FH at t=$t")
    }
  }

  test("q311: log-rank chi2 matches a Scala per-time recomputation") {
    val out = queries.StatsQueries.queries("q311_log_rank")(spark, sf)
      .collect()(0)
    // independent reconstruction of the per-(t, g) life table
    val life = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("g"))
      .agg(min(to_date(col("o_orderdate"))).as("f"),
        max(to_date(col("o_orderdate"))).as("l"))
    val hor = life.agg(max(col("l"))).collect()(0).getDate(0)
    val rows = life.select(datediff(col("l"), col("f")).as("t"), col("g"),
      (col("l") <= date_sub(lit(hor), 90)).cast("long").as("ev"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val times = rows.map(_._1).distinct.sorted
    var (sa, se, sv) = (0.0, 0.0, 0.0)
    times.foreach { t =>
      val n1 = rows.count(r => r._2 == 1 && r._1 >= t).toDouble
      val n0 = rows.count(r => r._2 == 0 && r._1 >= t).toDouble
      val d1 = rows.count(r => r._2 == 1 && r._1 == t && r._3 == 1).toDouble
      val d0 = rows.count(r => r._2 == 0 && r._1 == t && r._3 == 1).toDouble
      val (n, dd) = (n1 + n0, d1 + d0)
      if (dd > 0 && n > 1) {
        sa += d1; se += dd * n1 / n
        sv += dd * (n1 / n) * (1 - n1 / n) * (n - dd) / (n - 1)
      }
    }
    val chi2 = (sa - se) * (sa - se) / sv
    assert(math.abs(out.getDouble(4) - chi2) < 1e-3,
      s"logrank ${out.getDouble(4)} vs $chi2")
    assert(out.getLong(2) == sa.toLong)
  }

  test("q312: deciles partition the corpus; capture ends at 1; lift ends at 1") {
    val rows = queries.StatsQueries.queries("q312_lift_deciles")(spark, sf)
      .orderBy("decile").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val n = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n, "deciles must partition all docs")
    val caps = rows.map(_.getDouble(4))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(math.abs(caps.last - 1.0) < 1e-9)
    assert(math.abs(rows.last.getDouble(5) - 1.0) < 1e-9,
      "cumulative lift at decile 10 is 1 by construction")
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("q313: engine power iteration equals a Scala re-fold; mass ~ 1") {
    val pMat = queries.BehaviorQueries.queries(
      "q240_markov_transitions")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2).toDouble)).toMap
    // rebuild exact p = n/tot (q240's p column is rounded; use counts)
    // — including the round-16 sink self-loops: states are the UNION
    // of sources and destinations, a sink-only state transitions to
    // itself with p = 1, so the chain is stochastic and Σπ conserved
    val tots = pMat.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val states = (pMat.keys.map(_._1) ++ pMat.keys.map(_._2))
      .toSeq.distinct.sorted
    val withLoops = pMat ++ states.filterNot(tots.contains)
      .map(s0 => (s0, s0) -> 1.0)
    val loopTots = tots ++ states.filterNot(tots.contains).map(_ -> 1.0)
    var pi = states.map(s0 => s0 -> 1.0 / states.size).toMap
    for (_ <- 1 to 4) {
      val next = scala.collection.mutable.Map[String, java.math.BigDecimal]()
      withLoops.toSeq.sortBy(_._1).foreach { case ((f, t), n) =>
        if (pi.contains(f)) {
          val term = java.math.BigDecimal.valueOf(pi(f) * (n / loopTots(f)))
            .setScale(14, java.math.RoundingMode.HALF_UP)
          next(t) = next.getOrElse(t,
            java.math.BigDecimal.ZERO).add(term)
        }
      }
      pi = next.map { case (k, v) => k -> v.doubleValue }.toMap
    }
    val out = queries.BehaviorQueries.queries(
      "q313_stationary_dist")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach { case (st, p) =>
      assert(math.abs(p - pi(st)) < 1e-6, s"$st: $p vs ${pi(st)}")
      assert(p >= 0.0)
    }
    // stochastic by construction now: conserved to output rounding
    // (|states| × 5e-7 from the 6-decimal rounding of each share)
    assert(math.abs(out.values.sum - 1.0) < 1e-5,
      "stationary mass conserved up to 6-decimal output rounding")
  }

  test("q314: assignment counts match a JVM md5 recomputation") {
    val out = queries.StatsQueries.queries("q314_srm_check")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val keys = Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq("exp1", "exp2", "exp3").foreach { e =>
      val arm1 = keys.count { k =>
        val hex = md.digest(s"$e:$k".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 12)
        java.lang.Long.parseLong(hex, 16) % 2 == 1
      }
      val (n, a0, a1) = out(e)
      assert(n == keys.length && a1 == arm1 && a0 == n - arm1,
        s"$e: engine ($n,$a0,$a1) vs jvm (${keys.length},${keys.length - arm1},$arm1)")
    }
  }

  test("q315: Lorenz shares are monotone, end at 1, sit under the diagonal") {
    val rows = queries.StatsQueries.queries("q315_lorenz")(spark, sf)
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val pop = sorted.map(_.getDouble(4))
      val mass = sorted.map(_.getDouble(5))
      assert(math.abs(pop.last - 1.0) < 1e-9 &&
        math.abs(mass.last - 1.0) < 1e-9, s"$src: shares must end at 1")
      assert(mass.zip(mass.tail).forall { case (a, b) => a <= b + 1e-12 })
      sorted.foreach { r =>
        assert(r.getDouble(5) <= r.getDouble(4) + 1e-9,
          s"$src: ascending-sorted Lorenz must sit under the diagonal")
      }
    }
  }

  test("q316: 2x2 cells partition the corpus; margins match q304's keeps") {
    val rows = queries.StatsQueries.queries("q316_rater_pairs")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(8))).toMap
    val q304 = queries.StatsQueries.queries("q304_fleiss_kappa")(spark, sf)
      .collect()(0)
    val (n, k1, k2, k3) = (q304.getLong(0), q304.getLong(1),
      q304.getLong(2), q304.getLong(3))
    rows.foreach { case (pair, (a, b, c, d, kappa)) =>
      assert(a + b + c + d == n, s"$pair: cells must partition the corpus")
      assert(kappa <= 1.0 + 1e-9)
    }
    // marginal cross-check against the independent q304 keep counts
    val (a12, b12, _, _, _) = rows("r1_vs_r2")
    val (a13, b13, c13, _, _) = rows("r1_vs_r3")
    val (a23, b23, _, _, _) = rows("r2_vs_r3")
    assert(a12 + b12 == k1 && a13 + b13 == k1, "r1 margin")
    assert(a23 + b23 == k2, "r2 margin")
    assert(a13 + c13 == k3, "r3 margin")
  }

  test("q317: y = trend + seasonal + residual; seasonal centers to zero") {
    val rows = queries.StatsQueries.queries(
      "q317_seasonal_decompose")(spark, sf).collect()
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val recon = r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
      assert(math.abs(recon - r.getLong(2)) < 3e-6,
        s"${r.getString(0)}/${r.getLong(1)}: $recon != ${r.getLong(2)}")
    }
    rows.groupBy(_.getString(0)).foreach { case (prio, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      // centered MA undefined for exactly the first and last 6 months
      assert(sorted.take(6).forall(_.isNullAt(3)) &&
        sorted.takeRight(6).forall(_.isNullAt(3)), s"$prio: edge nulls")
      assert(sorted.drop(6).dropRight(6).forall(!_.isNullAt(3)),
        s"$prio: interior trend defined")
      // one seasonal component per month-of-year, centered to ~zero
      val seasByMoy = sorted.filter(!_.isNullAt(4))
        .map(r => (r.getLong(1) % 100) -> r.getDouble(4)).distinct
      assert(math.abs(seasByMoy.map(_._2).sum) < 2e-5,
        s"$prio: seasonal must center to zero")
    }
  }
}
