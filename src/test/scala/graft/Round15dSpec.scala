package graft

import org.apache.spark.sql.functions._

/** Round-15 batch-7 invariants (omnibus tests): each statistic is
  * re-derived independently on the driver from the raw (source,
  * length) table in plain Scala — midranks, moments, and medians
  * computed by a different code path than both the engine and the
  * DuckDB mirror.
  */
class Round15dSpec extends SparkSpecBase {

  private def lengthRows(): Array[(String, Long, Long)] =
    Tables.documents(spark, sf)
      .groupBy(col("source"), col("n_chars")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("q318: H matches a Scala midrank recomputation; tie correction raises H") {
    val out = queries.StatsQueries.queries("q318_kruskal_wallis")(spark, sf)
      .collect()(0)
    val rows = lengthRows()
    val n = rows.map(_._3).sum
    // doubled midranks per distinct value over the pooled ordering
    val byV = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      .toSeq.sortBy(_._1)
    var below = 0L
    val r2 = byV.map { case (v, m) =>
      val r = 2 * below + m + 1; below += m; v -> r
    }.toMap
    // .toSeq first: mapping a Map to PAIRS would rebuild a Map and
    // collapse groups that share the same size
    val perG = rows.groupBy(_._1).toSeq.map { case (_, rs) =>
      val ns = rs.map(_._3).sum
      val rsum2 = rs.map(r => r._3 * r2(r._2)).sum // doubled rank-sum
      (ns, rsum2)
    }
    val sr = perG.map { case (ns, rs2) =>
      rs2.toDouble * rs2 / (4.0 * ns)
    }.sum
    val h = 12.0 / (n.toDouble * (n + 1)) * sr - 3.0 * (n + 1)
    assert(math.abs(out.getDouble(3) - h) < 1e-4,
      s"H ${out.getDouble(3)} vs $h")
    assert(out.getDouble(4) >= out.getDouble(3) - 1e-9,
      "tie correction divides by <= 1, so it can only raise H")
    assert(out.getLong(2) == perG.size - 1)
  }

  test("q319: F and eta^2 match a Scala moment recomputation") {
    val out = queries.StatsQueries.queries("q319_anova_f")(spark, sf)
      .collect()(0)
    val rows = lengthRows()
    val perG = rows.groupBy(_._1).map { case (_, rs) =>
      val ns = rs.map(_._3).sum
      val sx = rs.map(r => r._2 * r._3).sum
      val sxx = rs.map(r => r._2 * r._2 * r._3).sum
      (ns, sx, sxx)
    }
    val (n, tsx) = (perG.map(_._1).sum, perG.map(_._2).sum)
    val gm = tsx.toDouble / n
    val ssb = perG.map { case (ns, sx, _) =>
      ns * math.pow(sx.toDouble / ns - gm, 2)
    }.sum
    val ssw = perG.map { case (ns, sx, sxx) =>
      sxx.toDouble - sx.toDouble * sx / ns
    }.sum
    val k = perG.size
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(out.getDouble(6) - f) < 1e-3,
      s"F ${out.getDouble(6)} vs $f")
    assert(math.abs(out.getDouble(7) - ssb / (ssb + ssw)) < 1e-5)
    assert(out.getLong(1) == n && out.getLong(0) == k)
  }

  test("q320: Brown-Forsythe F matches a Scala median-deviation recomputation") {
    val out = queries.StatsQueries.queries("q320_brown_forsythe")(spark, sf)
      .collect()(0)
    val rows = lengthRows()
    val perG = rows.groupBy(_._1).map { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      val ns = sorted.map(_._3).sum
      var cum = 0L
      val med = sorted.find { r => cum += r._3; cum * 2 >= ns }.get._2
      val sz = sorted.map(r => r._3 * math.abs(r._2 - med)).sum
      val szz = sorted.map { r =>
        val z = math.abs(r._2 - med); r._3 * z * z
      }.sum
      (ns, sz, szz)
    }
    val (n, tsz) = (perG.map(_._1).sum, perG.map(_._2).sum)
    val gm = tsz.toDouble / n
    val ssb = perG.map { case (ns, sz, _) =>
      ns * math.pow(sz.toDouble / ns - gm, 2)
    }.sum
    val ssw = perG.map { case (ns, sz, szz) =>
      szz.toDouble - sz.toDouble * sz / ns
    }.sum
    val k = perG.size
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(out.getDouble(4) - f) < 1e-3,
      s"BF F ${out.getDouble(4)} vs $f")
    assert(out.getDouble(4) >= 0.0)
  }

  test("q321: pair count k(k-1)/2; t consistent with q319's pooled MSW") {
    val pairs = queries.StatsQueries.queries("q321_tukey_pairs")(spark, sf)
      .collect()
    val anova = queries.StatsQueries.queries("q319_anova_f")(spark, sf)
      .collect()(0)
    val k = anova.getLong(0)
    assert(pairs.length == k * (k - 1) / 2)
    val msw = anova.getDouble(5) / anova.getLong(3) // ss_within / df_within
    pairs.foreach { p =>
      val (na, nb) = (p.getLong(2), p.getLong(3))
      val se = math.sqrt(msw * (1.0 / na + 1.0 / nb))
      assert(math.abs(p.getDouble(5) - se) < 1e-4,
        s"${p.getString(0)}/${p.getString(1)}: se ${p.getDouble(5)} vs $se")
      assert(math.abs(p.getDouble(6) - p.getDouble(4) / p.getDouble(5))
        < 1e-3)
    }
  }

  test("q322: Gumbel fit matches a Scala block-maxima recomputation") {
    val out = queries.StatsQueries.queries("q322_gumbel_evt")(spark, sf)
      .collect()
    val bm = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .as("ym"))
      .agg(max(round(col("o_totalprice") * 100, 0).cast("long")).as("bm"))
      .collect().map(r => r.getString(0) -> r.getLong(2))
    out.foreach { r =>
      val xs = bm.filter(_._1 == r.getString(0)).map(_._2.toDouble)
      val n = xs.length
      val mean = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      val beta = sd * math.sqrt(6.0) / math.Pi
      val mu = mean - 0.5772156649015329 * beta
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(4) - mu) < math.abs(mu) * 1e-6 + 1e-3)
      assert(math.abs(r.getDouble(5) - beta) < beta * 1e-6 + 1e-3)
      // the 99% return level must exceed the mean block max
      assert(r.getDouble(6) > r.getDouble(2))
    }
  }
}
