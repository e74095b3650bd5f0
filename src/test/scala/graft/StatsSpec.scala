package graft

import org.apache.spark.sql.functions._

/** Round-15 statistics-layer invariants (q268–q279). Each test
  * re-derives the statistic INDEPENDENTLY on the driver (plain Scala
  * over the collected sf0.001 frames — no Spark, no SQL) and compares
  * against the engine, so a shared misreading of the formula in both
  * the query and its DuckDB oracle cannot slip through hash-green.
  */
class StatsSpec extends SparkSpecBase {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q268: Kaplan-Meier survival is a non-increasing product of exact hazard factors") {
    val rows = q("q268_kaplan_meier").collect()
    assert(rows.nonEmpty)
    // monotone non-increasing, within [0,1]
    val surv = rows.map(_.getDouble(4))
    assert(surv.forall(v => v >= 0.0 && v <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-12 })
    // independent product recomputation from the emitted (d, n) pairs:
    // S_k = prod_{i<=k} (1 - d_i/n_i) — the non-event rows the query
    // filtered out contribute factor 1 and cannot change the product
    var s = 1.0
    rows.foreach { r =>
      val atRisk = r.getLong(1); val d = r.getLong(2)
      s *= (1.0 - d.toDouble / atRisk)
      assert(math.abs(r.getDouble(4) - s) < 2e-6,
        s"t=${r.getLong(0)}: reported ${r.getDouble(4)} vs recomputed $s")
    }
    // censoring is real in this horizon construction
    assert(rows.map(_.getLong(3)).sum > 0, "no censored lifetimes — horizon broken")
  }

  test("q269: chi-square cells reconcile with margins; cum statistic sums the terms") {
    val rows = q("q269_chi2_independence").collect()
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nOrders)
    assert(rows.forall(_.getLong(6) == 16L), "dof must be (5-1)*(5-1)")
    val termSum = rows.map(_.getDouble(4)).sum
    val lastCum = rows.last.getDouble(5)
    assert(math.abs(termSum - lastCum) < 1e-3,
      s"cum statistic $lastCum drifts from term sum $termSum")
  }

  test("q270: Spearman rho matches a plain-Scala midrank recomputation") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_discount"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    def midranks(vs: Seq[Double]): Map[Double, Double] = {
      val grouped = vs.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
      var before = 0L
      grouped.map { case (v, m) =>
        val r = (2L * before + m + 1).toDouble / 2
        before += m
        v -> r
      }.toMap
    }
    val expected = li.groupBy(_._1).map { case (rf, rows) =>
      val rx = midranks(rows.map(_._2)); val ry = midranks(rows.map(_._3))
      val xs = rows.map(r => rx(r._2)); val ys = rows.map(r => ry(r._3))
      val n = xs.size.toDouble
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(v => v * v).sum; val syy = ys.map(v => v * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      rf -> (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    q("q270_spearman").collect().foreach { r =>
      val rho = r.getDouble(2)
      assert(math.abs(rho) <= 1.0 + 1e-12)
      assert(math.abs(rho - expected(r.getString(0))) < 1e-6,
        s"${r.getString(0)}: engine $rho vs recomputed ${expected(r.getString(0))}")
    }
  }

  test("q271: KS sup-gap matches a plain-Scala ECDF sweep per source") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val domain = docs.map(_._2).distinct.sorted
    val total = docs.length.toLong
    q("q271_ks_test").collect().foreach { r =>
      val src = r.getString(0); val nS = r.getLong(1)
      val inSrc = docs.filter(_._1 == src).map(_._2)
      assert(nS == inSrc.length.toLong)
      val nR = total - nS
      var cs = 0L; var ca = 0L; var gmax = 0L
      domain.foreach { v =>
        cs += inSrc.count(_ == v)
        ca += docs.count(_._2 == v)
        val gap = math.abs(cs * nR - (ca - cs) * nS)
        if (gap > gmax) gmax = gap
      }
      val d = gmax.toDouble / (nS * nR)
      assert(math.abs(r.getDouble(2) - d) < 1e-6,
        s"$src: engine D ${r.getDouble(2)} vs recomputed $d")
    }
  }

  test("q272: the window rewrite equals Page's max(0, S+dev) recursion exactly") {
    val rows = q("q272_cusum").collect()
    val nd = rows.length.toLong
    val rc = rows.map(r => math.round(r.getDouble(1) * 100))
    val trc = rc.sum
    var s = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      s = math.max(0L, s + (rc(i) * nd - trc))
      val expect = BigDecimal(s.toDouble / nd / 100)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - expect) < 1e-9,
        s"day ${r.get(0)}: cusum ${r.getDouble(2)} vs recursion $expect")
    }
    assert(rows.count(_.getLong(3) == 1L) >= 1, "argmax day must be flagged")
  }

  test("q273: RFM quintiles are balanced and cover every customer") {
    val rows = q("q273_rfm").collect()
    val nCust = Tables.orders(spark, sf).select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCust)
    Seq(0, 1, 2).foreach { dim =>
      val tiles = rows.groupBy(_.getLong(dim)).view
        .mapValues(_.map(_.getLong(3)).sum).toMap
      assert(tiles.keySet == Set(1L, 2L, 3L, 4L, 5L), s"dim $dim missing tiles")
      assert(tiles.values.max - tiles.values.min <= 1,
        s"dim $dim unbalanced: $tiles")
    }
  }

  test("q274: span histogram matches a sequential driver-side packing scan") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), math.max(1L, (r.getLong(1) + 3) / 4)))
      .sortBy(_._1)
    var cum = 0L
    val spans = docs.map { case (_, tok) =>
      val first = cum / 2048; cum += tok; val last = (cum - 1) / 2048
      last - first + 1
    }
    val expected = spans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totalChunks = (cum + 2047) / 2048
    val rows = q("q274_seq_packing").collect()
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
    assert(rows.forall(_.getLong(3) == totalChunks))
    assert(rows.map(_.getLong(1)).sum == docs.length.toLong)
  }

  test("q275: lag-1 autocorrelation matches the scaled-integer recomputation") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("d")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .sortBy(_._1)
    val nd = daily.length.toLong
    val tc = daily.map(_._2).sum
    val byDay = daily.toMap
    val den = daily.map { case (_, c) => val v = c * nd - tc; v * v }.sum
    def acf(lag: Long): Double = daily.flatMap { case (di, cx) =>
      byDay.get(di + lag).map(cy => (cx * nd - tc) * (cy * nd - tc))
    }.sum.toDouble / den
    val rows = q("q275_acf").collect()
    assert(rows.length == 14)
    rows.take(3).foreach { r =>
      assert(math.abs(r.getDouble(2) - acf(r.getLong(0))) < 1e-6,
        s"lag ${r.getLong(0)}: ${r.getDouble(2)} vs ${acf(r.getLong(0))}")
    }
  }

  test("q276: containment matches a driver-side first/last sweep for every pair") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUserType = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(es => (es.map(_._3).min, es.map(_._3).max)).toMap
    val types = ev.map(_._2).distinct.sorted
    val users = ev.map(_._1).distinct
    q("q276_seq_containment").collect().foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      var both = 0L; var seq = 0L
      users.foreach { u =>
        (byUserType.get((u, a)), byUserType.get((u, b))) match {
          case (Some((amin, _)), Some((_, bmax))) =>
            both += 1; if (amin < bmax) seq += 1
          case _ =>
        }
      }
      assert(r.getLong(2) == both && r.getLong(3) == seq,
        s"($a,$b): engine (${r.getLong(2)},${r.getLong(3)}) vs scan ($both,$seq)")
    }
    assert(types.size * (types.size - 1) ==
      q("q276_seq_containment").count().toInt)
  }

  test("q277: ABC classes partition the catalog and the revenue mass") {
    val rows = q("q277_pareto_abc").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    val nParts = Tables.lineitem(spark, sf)
      .select(col("l_partkey")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nParts)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 3e-6)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 3e-6)
    // the head class must hold at least its nominal share, and with
    // far fewer parts than the tail holds
    val a = rows.find(_.getString(0) == "A").get
    assert(a.getDouble(3) <= 0.81 && a.getDouble(3) >= 0.75)
    assert(a.getDouble(4) < a.getDouble(3), "A must be revenue-denser than its part share")
  }

  test("q278: EWMA stays inside its 7-day window envelope and weights recent days") {
    val rows = q("q278_ewma").collect()
    val byDay = rows.map(r => r.getTimestamp(0).getTime -> r.getDouble(1)).toMap
    val dayMs = 86400000L
    var checked = 0
    rows.foreach { r =>
      val t = r.getTimestamp(0).getTime
      val window = (0L to 6L).flatMap(j => byDay.get(t - j * dayMs))
      if (window.size == 7) {
        checked += 1
        assert(r.getDouble(2) >= window.min - 1e-6 &&
          r.getDouble(2) <= window.max + 1e-6)
        // exact recomputation with the 64..1 geometric weights
        val num = (0L to 6L).map(j =>
          math.round(byDay(t - j * dayMs) * 100) * (64L >> j.toInt)).sum
        val expect = BigDecimal(num.toDouble / 127 / 100)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(2) - expect) < 1e-9)
      }
    }
    // sf0.001's calendar is ~45% dense, so fully-dense 7-day windows
    // are rare — but each one exercised is an exact-equality check
    assert(checked >= 10, s"too few dense windows exercised: $checked")
  }

  test("q280: DiD cells partition the purchases and the estimate is the double difference") {
    val r = q("q280_diff_in_diff").collect().head
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3) == nPurch)
    val did = (r.getDouble(5) - r.getDouble(4)) - (r.getDouble(7) - r.getDouble(6))
    assert(math.abs(r.getDouble(8) - did) < 1e-5,
      s"did ${r.getDouble(8)} vs cell-mean double difference $did")
  }

  test("q281: MAE/RMSE/MAPE match a driver-side sweep of the lag-7 naive forecast") {
    val daily = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(round(col("o_totalprice"), 2)
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))) * 100)
        .cast("long").as("rc"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1) / 100))
      .toMap
    val pairs = daily.toSeq.flatMap { case (di, rd) =>
      daily.get(di - 7).map(rd7 => (rd, rd - rd7))
    }
    val n = pairs.size.toDouble
    val mae = pairs.map(p => math.abs(p._2)).sum / n
    val rmse = math.sqrt(pairs.map(p => p._2.toDouble * p._2).sum / n)
    val mape = pairs.map(p => math.abs(p._2).toDouble / p._1).sum / n
    val r = q("q281_forecast_eval").collect().head
    assert(r.getLong(0) == pairs.size.toLong)
    assert(math.abs(r.getDouble(1) - mae) < 1e-5, s"mae ${r.getDouble(1)} vs $mae")
    assert(math.abs(r.getDouble(2) - rmse) < 1e-5, s"rmse ${r.getDouble(2)} vs $rmse")
    assert(math.abs(r.getDouble(3) - mape) < 1e-5, s"mape ${r.getDouble(3)} vs $mape")
  }

  test("q282: dispersion index equals variance/mean of the daily counts") {
    val cs = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate"))).agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    val n = cs.length.toDouble
    val mean = cs.sum / n
    val varc = (n * cs.map(c => c * c).sum - cs.sum.toDouble * cs.sum) / (n * (n - 1))
    val r = q("q282_dispersion").collect().head
    assert(r.getLong(0) == cs.length.toLong)
    assert(math.abs(r.getDouble(1) - mean) < 1e-5)
    assert(math.abs(r.getDouble(2) - varc) < 1e-5)
    assert(math.abs(r.getDouble(3) - varc / mean) < 1e-5)
    assert(math.abs(r.getDouble(4) - (n - 1) * (varc / mean)) < 1e-3)
  }

  test("q283: CCF matches a driver-side Pearson over the paired days at each lag") {
    val rows = q("q283_cross_correlation").collect()
    assert(rows.length == 15)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-12))
    val ord = Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(round(col("o_totalprice"), 2)
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))) * 100)
        .cast("long").as("rc"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1) / 100))
      .toMap
    val ship = Tables.lineitem(spark, sf)
      .groupBy(to_date(col("l_shipdate")).as("d")).agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1))).toMap
    Seq(0L, 3L, -5L).foreach { lag =>
      val pairs = ord.toSeq.flatMap { case (di, x) =>
        ship.get(di + lag).map(y => (x.toDouble, y.toDouble))
      }
      val n = pairs.size.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val ccf = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      val engine = rows.find(_.getLong(0) == lag).get
      assert(engine.getLong(1) == pairs.size.toLong)
      assert(math.abs(engine.getDouble(2) - ccf) < 1e-6,
        s"lag $lag: ${engine.getDouble(2)} vs $ccf")
    }
  }

  test("q284: trimmed mean equals the sort-drop-average reference per source") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    q("q284_trimmed_mean").collect().foreach { r =>
      val vs = docs.filter(_._1 == r.getString(0)).map(_._2).sorted
      val lo = vs.length / 10; val hi = vs.length - lo
      val kept = vs.slice(lo.toInt, hi.toInt)
      val tm = kept.sum.toDouble / kept.length
      assert(r.getLong(1) == vs.length.toLong)
      assert(math.abs(r.getDouble(3) - tm) < 1e-6,
        s"${r.getString(0)}: ${r.getDouble(3)} vs $tm")
      assert(math.abs(r.getDouble(2) - vs.sum.toDouble / vs.length) < 1e-6)
    }
  }

  test("q285: median and MAD are the exact nearest-rank picks per source") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def lowerMedian(vs: Seq[Long]): Long = {
      val s = vs.sorted; s((vs.length - 1) / 2)
    }
    q("q285_mad").collect().foreach { r =>
      val vs = docs.filter(_._1 == r.getString(0)).map(_._2).toSeq
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)))
      assert(r.getLong(1) == vs.length.toLong)
      assert(r.getLong(2) == med, s"${r.getString(0)}: median ${r.getLong(2)} vs $med")
      assert(r.getLong(3) == mad, s"${r.getString(0)}: mad ${r.getLong(3)} vs $mad")
    }
  }

  test("q286: cumulative uniques is the running count of first-seen users, day by day") {
    val rows = q("q286_cumulative_uniques").collect()
    val totalUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    // final cumulative = all users ever seen; new_users telescope to it
    assert(rows.last.getLong(4) == totalUsers)
    assert(rows.map(_.getLong(2)).sum == totalUsers)
    // cum is the prefix sum of new_users and is non-decreasing
    var run = 0L
    rows.foreach { r =>
      run += r.getLong(2)
      assert(r.getLong(4) == run, s"day ${r.getLong(0)}: cum drifts")
      assert(r.getLong(3) >= 0L, "returning_users negative")
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3))
    }
  }

  test("q287: FIM cuts conserve token mass and land on the order-statistics thirds") {
    val rows = q("q287_fim_plan").collect()
    rows.foreach { r =>
      val fr = Seq(r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(fr.sum - 1.0) < 3e-6,
        s"${r.getString(0)}: split mass ${fr.sum} != 1")
      // two iid uniform cuts split the unit interval into thirds in
      // expectation; with hundreds of docs per source the sample
      // fractions concentrate loosely around 1/3
      fr.foreach(f => assert(f > 0.15 && f < 0.55,
        s"${r.getString(0)}: fraction $f far from the uniform-cut law"))
      assert(r.getLong(6) <= r.getLong(1), "empty-middle count exceeds docs")
    }
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sf).count())
  }

  test("q288: seasonal indices average to the grand mean (weighted identity)") {
    val rows = q("q288_seasonal_index").collect()
    assert(rows.length == 7)
    // Σ n_w · index_w = N (the weighted-mean identity: weekday means
    // scaled by the grand mean must reconstruct the total)
    val n = rows.map(_.getLong(1)).sum.toDouble
    val weighted = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(weighted - n) < 1e-2, s"Σ n_w·idx_w = $weighted != $n")
    assert(rows.forall(_.getDouble(3) > 0.0))
  }

  test("q289: top paths match a driver-side first-3-prefix scan") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).map { case (_, es) =>
      es.sortBy(e => (e._3, e._4)).take(3).map(_._2).mkString(">")
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = q("q289_top_paths").collect()
    assert(rows.length <= 20)
    rows.foreach { r =>
      assert(expected(r.getString(0)) == r.getLong(1),
        s"${r.getString(0)}: ${r.getLong(1)} vs ${expected(r.getString(0))}")
    }
    // top-20 really is the top: no unlisted path outcounts the listed min
    val listedMin = rows.map(_.getLong(1)).min
    val unlisted = expected.filterNot(kv => rows.exists(_.getString(0) == kv._1))
    assert(unlisted.values.forall(_ <= listedMin))
  }

  test("q290: verdict rollup matches a driver-side heuristic sweep") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val verdicts = ev.groupBy(_._1).toSeq.map { case (_, es) =>
      val ts = es.map(_._3).sorted
      val maxPerMin = es.groupBy(_._3 / 60000000L).values.map(_.size).max
      val minGap = if (ts.length < 2) None
        else Some(ts.zip(ts.tail).map(p => p._2 - p._1).min)
      val bot = maxPerMin >= 5 || minGap.exists(_ < 1000000L)
      (if (bot) "bot_like" else "human_like", es.size.toLong)
    }
    val expected = verdicts.groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
    q("q290_bot_score").collect().foreach { r =>
      val (nu, te) = expected(r.getString(0))
      assert(r.getLong(1) == nu && r.getLong(2) == te,
        s"${r.getString(0)}: (${r.getLong(1)},${r.getLong(2)}) vs ($nu,$te)")
    }
  }

  test("q291: fulfillment-lag quantiles are the exact nearest-rank picks per priority") {
    val lags = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong))
    def nearestRank(vs: Seq[Long], p: Int): Long = {
      val s = vs.sorted
      s.zipWithIndex.find { case (_, i) => (i + 1) * 100 >= p * s.length }
        .get._1
    }
    q("q291_fulfillment_lag").collect().foreach { r =>
      val vs = lags.filter(_._1 == r.getString(0)).map(_._2).toSeq
      assert(r.getLong(1) == vs.length.toLong)
      assert(r.getLong(2) == nearestRank(vs, 50))
      assert(r.getLong(3) == nearestRank(vs, 90))
      assert(r.getLong(4) == nearestRank(vs, 99))
      assert(r.getLong(5) == vs.max)
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
    }
  }

  test("q292: base month indexes to exactly 1 and later months match the basket recomputation") {
    val rows = q("q292_price_index").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getDouble(2) == 1.0, "base month must index to 1.0")
    // driver-side basket recomputation for every month
    val mp = Tables.lineitem(spark, sf)
      .groupBy((year(to_date(col("l_shipdate"))) * 100
        + month(to_date(col("l_shipdate")))).as("ym"), col("l_partkey"))
      .agg((sum(round(col("l_extendedprice"), 2)
        .cast(org.apache.spark.sql.types.DecimalType(18, 2))) * 100)
        .cast("long").as("e"), sum(col("l_quantity")).cast("long").as("q"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    val ym0 = mp.map(_._1._1).min
    val basket = mp.filter(_._1._1 == ym0)
      .map { case ((_, pk), (e, qn)) => pk -> (e, qn) }.toMap
    rows.foreach { r =>
      val ym = r.getLong(0).toInt
      val month = mp.filter(_._1._1 == ym)
        .map { case ((_, pk), (e, qn)) => pk -> (e, qn) }.toMap
      val common = month.keySet.intersect(basket.keySet).toSeq.sorted
      val num = common.map { pk =>
        val (e, qn) = month(pk); e.toDouble / qn * basket(pk)._2 }.sum
      val den = common.map { pk =>
        val (e0, q0) = basket(pk); e0.toDouble / q0 * q0 }.sum
      assert(r.getLong(1) == common.size.toLong)
      assert(math.abs(r.getDouble(2) - num / den) < 1e-5,
        s"month $ym: ${r.getDouble(2)} vs ${num / den}")
    }
  }

  test("q293: information gain is non-negative and entropies match a driver recomputation") {
    val rows = q("q293_split_gain").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("priority", "segment"))
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1e-6, s"${r.getString(0)}: negative gain")
      assert(r.getDouble(2) <= r.getDouble(1) + 1e-6,
        "conditional entropy exceeds the marginal")
      assert(math.abs(r.getDouble(1) - r.getDouble(2) - r.getDouble(3)) < 2e-6)
    }
    // independent recomputation for the segment feature
    val base = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderstatus"), col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def h(counts: Seq[Long]): Double = {
      val n = counts.sum.toDouble
      -counts.map(c => c / n * math.log(c / n)).sum
    }
    val hLabel = h(base.groupBy(_._1).values.map(_.size.toLong).toSeq)
    val hCond = base.groupBy(_._2).values.map { vs =>
      vs.size.toDouble / base.length *
        h(vs.groupBy(_._1).values.map(_.size.toLong).toSeq)
    }.sum
    val seg = rows.find(_.getString(0) == "segment").get
    assert(math.abs(seg.getDouble(1) - hLabel) < 1e-5)
    assert(math.abs(seg.getDouble(2) - hCond) < 1e-5)
  }

  test("q294: the snapshot is point-in-time correct against a driver reconstruction") {
    val edge = Tables.orders(spark, sf)
      .agg(max(to_date(col("o_orderdate")))).collect().head
      .getDate(0).toLocalDate
    val cutoff = edge.minusDays(180)
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")),
        round(col("o_totalprice"), 2))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val byCust = orders.groupBy(_._1).toSeq.flatMap { case (_, os) =>
      val past = os.filter(_._2.isBefore(cutoff))
      if (past.isEmpty) None
      else {
        val post = os.count(o => !o._2.isBefore(cutoff) &&
          o._2.isBefore(cutoff.plusDays(90)))
        Some((if (post > 0) "retained" else "churned",
          past.size.toLong,
          past.map(o => math.round(o._3 * 100)).sum,
          java.time.temporal.ChronoUnit.DAYS.between(
            past.map(_._2).max, cutoff)))
      }
    }
    val expected = byCust.groupBy(_._1).view.mapValues { vs =>
      (vs.size.toLong, vs.map(_._2).sum.toDouble / vs.size,
        vs.map(_._3).sum.toDouble / 100 / vs.size,
        vs.map(_._4).sum.toDouble / vs.size)
    }.toMap
    val rows = q("q294_feature_snapshot").collect()
    rows.foreach { r =>
      val (n, po, ps, rec) = expected(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - po) < 1e-5)
      assert(math.abs(r.getDouble(3) - ps) < 1e-5)
      assert(math.abs(r.getDouble(4) - rec) < 1e-5)
    }
    // the behavioral sanity read: frequent buyers retain
    val ret = rows.find(_.getString(0) == "retained").get
    val chn = rows.find(_.getString(0) == "churned").get
    assert(ret.getDouble(2) > chn.getDouble(2),
      "retained cohort should average more past orders")
  }

  test("q295: OOV curve is monotone in vocab size and matches an exact rank sweep") {
    val r = q("q295_vocab_curve").collect().head
    assert(r.getDouble(2) >= r.getDouble(3) && r.getDouble(3) >= r.getDouble(4),
      "OOV must fall as the vocabulary grows")
    // driver-side exact recomputation
    import graft.functions.GraftFunctions
    val words = Tables.documents(spark, sf)
      .select(explode(GraftFunctions.normWords(col("text"))).as("w"))
      .collect().map(_.getString(0))
    val ranked = words.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (w, c) => (-c, w) }
    val total = words.length.toLong
    assert(r.getLong(0) == total && r.getLong(1) == ranked.size.toLong)
    Seq((250, r.getDouble(2)), (1000, r.getDouble(3)), (4000, r.getDouble(4)))
      .foreach { case (k, got) =>
        val oov = ranked.drop(k).map(_._2).sum.toDouble / total
        assert(math.abs(got - oov) < 1e-6, s"K=$k: $got vs $oov")
      }
  }

  test("q296: denoiser mix covers R/S/X with their nominal mask rates and conserves docs") {
    val rows = q("q296_ul2_mix").collect()
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sf).count())
    val byDen = rows.groupBy(_.getString(1))
    assert(byDen.keySet == Set("R", "S", "X"), s"missing denoisers: ${byDen.keySet}")
    // nominal rates: R ~15% (span rounding pulls it below), S ~25%, X ~50%
    byDen.foreach { case (dz, rs) =>
      val frac = rs.map(r => r.getDouble(4) * r.getLong(3)).sum /
        rs.map(_.getLong(3)).sum
      dz match {
        case "R" => assert(frac > 0.05 && frac <= 0.16, s"R mask $frac")
        case "S" => assert(frac > 0.15 && frac <= 0.27, s"S mask $frac")
        case "X" => assert(frac > 0.3 && frac <= 0.51, s"X mask $frac")
      }
    }
    // spans: S is always exactly one span per doc
    rows.filter(_.getString(1) == "S").foreach(r =>
      assert(r.getDouble(5) == 1.0, "S denoiser must plan one span"))
  }

  test("q279: per-weekday JSD is bounded by ln 2 and its mixture terms are consistent") {
    val rows = q("q279_js_divergence").collect()
    val byWd = rows.groupBy(_.getLong(0))
    assert(byWd.keySet == (0L to 6L).toSet)
    byWd.foreach { case (wd, rs) =>
      val jsd = rs.map(_.getDouble(5)).max // cum is non-decreasing? not
      // necessarily (terms can be negative per-cell) — take the LAST
      // row in type order, which carries the full sum
      val last = rs.maxBy(_.getString(1))
      assert(last.getDouble(5) >= -1e-9 && last.getDouble(5) <= math.log(2.0) + 1e-9,
        s"weekday $wd JSD ${last.getDouble(5)} outside [0, ln 2]")
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 3e-6, s"weekday $wd p-mass $pSum")
      assert(jsd <= math.log(2.0) + 1e-9)
    }
  }
}
