package graft

import org.apache.spark.sql.functions._

/** Round-15 batch-2 invariants: link-prediction scores on hand graphs,
  * assortativity closed forms, jackknife/Theil internal identities,
  * BH step-up shape, an independent Scala re-fold of the Holt
  * recursion, quantile-normalization monotonicity, and Fleiss-kappa
  * self-consistency. These complement the DuckDB hash gate (which
  * pins cross-engine equality) by pinning the MATH.
  */
class Round15bSpec extends SparkSpecBase {

  import spark.implicits._

  test("linkPrediction: 4-cycle closes both diagonals with exact scores") {
    // square 1-2-3-4-1: non-edges (1,3),(2,4), each with 2 common
    // neighbors, jaccard 2/(2+2-2)=1, adamic-adar 2/ln(2)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val out = operators.Graph.linkPrediction(e)
      .orderBy("u", "w").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 3L), (2L, 4L)))
    out.foreach { r =>
      assert(r.getLong(2) == 2L)
      assert(r.getDouble(3) == 1.0)
      assert(math.abs(r.getDouble(4) - 2.0 / math.log(2.0)) < 1e-6)
    }
  }

  test("linkPrediction: existing edges are anti-joined out") {
    // triangle + pendant: 1-2-3-1, 3-4. distance-2 pairs: (1,4),(2,4)
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val pairs = operators.Graph.linkPrediction(e)
      .select("u", "w").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 4L), (2L, 4L))) // no triangle edge appears
  }

  test("assortativity: star graph is exactly -1, complete graph degenerate") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("a", "b")
    val r = operators.Graph.assortativity(star).collect()(0)
    assert(r.getLong(0) == 8L) // 2|E| directed ends
    assert(r.getDouble(2) == -1.0)
  }

  test("q299: jackknife SE matches an independent Scala recomputation") {
    val rows = queries.StatsQueries.queries("q299_jackknife")(spark, sf)
      .collect()
    val g = rows.length
    val loos = rows.map(_.getDouble(2)) // theta_loo (rounded 6 — tol below)
    val mean = loos.sum / g
    val se = math.sqrt((g - 1).toDouble / g *
      loos.map(v => (v - mean) * (v - mean)).sum)
    val got = rows.head.getDouble(6)
    assert(math.abs(got - se) < 1e-3, s"jack_se $got vs recomputed $se")
    // pseudo-value identity: mean(pseudo) == g*theta_hat - (g-1)*jack_mean
    val pm = rows.map(_.getDouble(3)).sum / g
    val th = rows.head.getDouble(4); val jm = rows.head.getDouble(5)
    assert(math.abs(pm - (g * th - (g - 1) * jm)) < 1e-3)
  }

  test("q300: Theil decomposition sums to the total index") {
    val rows = queries.StatsQueries.queries("q300_theil")(spark, sf)
      .collect()
    val between = rows.map(_.getDouble(5)).sum
    val within = rows.map(_.getDouble(6)).sum
    val total = rows.head.getDouble(7)
    assert(math.abs(between + within - total) < 1e-4,
      s"between $between + within $within != total $total")
    rows.foreach(r => assert(r.getDouble(3) >= 0.0,
      s"per-group Theil must be nonneg: ${r.getLong(0)}"))
    assert(total >= 0.0)
  }

  test("q301: BH discoveries form a rank prefix; p sorted and in [0,1]") {
    val rows = queries.StatsQueries.queries("q301_bh_fdr")(spark, sf)
      .orderBy("rank").collect()
    val ps = rows.map(_.getDouble(3))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b },
      "p must be nondecreasing in rank")
    val disc = rows.map(_.getInt(6))
    assert(disc.zip(disc.tail).forall { case (a, b) => a >= b },
      "discoveries must be a prefix of the rank order")
    // every discovered rank satisfied its own threshold at cutoff time:
    // the LAST discovery must have p <= thr (step-up certificate)
    rows.reverse.find(_.getInt(6) == 1).foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(5) + 1e-12)
    }
  }

  test("q301: the shared tail polynomial hits known normal quantiles") {
    val p = (z: Double) => spark.sql(
      s"SELECT ${functions.PValues.twoSidedP(z.toString)} AS p")
      .collect()(0).getDouble(0)
    assert(p(0.0) > 1.0 - 2e-7 && p(0.0) <= 1.0) // |ε| < 7.5e-8 per tail
    assert(math.abs(p(1.959964) - 0.05) < 1e-6)
    assert(math.abs(p(2.575829) - 0.01) < 1e-6)
    assert(p(10.0) < 1e-20)
  }

  test("q302: engine Holt recursion equals a Scala re-fold bit-for-bit") {
    val out = queries.StatsQueries.queries("q302_holt")(spark, sf)
      .collect()
    val byPrio = out.groupBy(_.getString(0))
    byPrio.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      var lvl = sorted.head.getLong(2).toDouble
      var tr = 0.0
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (i > 0) {
          val y = r.getLong(2).toDouble
          val l2 = 0.5 * y + 0.5 * (lvl + tr)
          tr = 0.3 * (l2 - lvl) + 0.7 * tr
          lvl = l2
        }
        // output is rounded at 6 decimals → half-ulp tolerance 5e-7,
        // plus one double ulp of slack for the round() itself
        assert(math.abs(r.getDouble(3) - lvl) < 6e-7 &&
          math.abs(r.getDouble(4) - tr) < 6e-7,
          s"level/trend drift at ${r.getLong(1)}")
      }
    }
  }

  test("q303: per-source mapping is monotone and lands on pooled values") {
    val out = queries.StatsQueries.queries(
      "q303_quantile_normalize")(spark, sf).collect()
    val pooled = Tables.documents(spark, sf)
      .select(col("n_chars")).distinct()
      .as[Long].collect().toSet
    out.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      val vn = sorted.map(_.getLong(4))
      assert(vn.zip(vn.tail).forall { case (a, b) => a <= b },
        s"$src: v_norm must be nondecreasing in v")
      vn.foreach(v => assert(pooled.contains(v),
        s"$src: mapped value $v not in pooled domain"))
      // the source maximum maps to the pooled maximum (share 1 → 1)
      assert(vn.last == pooled.max)
    }
  }

  test("q304: kappa is self-consistent with its own P-bar and P-e") {
    val r = queries.StatsQueries.queries("q304_fleiss_kappa")(spark, sf)
      .collect()(0)
    val (pBar, pe, kappa) =
      (r.getDouble(4), r.getDouble(6), r.getDouble(7))
    assert(math.abs(kappa - (pBar - pe) / (1 - pe)) < 1e-4)
    assert(pBar >= 1.0 / 3 - 1e-9 && pBar <= 1.0)
    assert(kappa <= 1.0)
    // p_keep consistent with the three rater keep counts
    val n = r.getLong(0)
    val sk = r.getLong(1) + r.getLong(2) + r.getLong(3)
    assert(math.abs(r.getDouble(5) - sk.toDouble / (3 * n)) < 1e-5)
  }
}
