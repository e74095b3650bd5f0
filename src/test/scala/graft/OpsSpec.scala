package graft

import org.apache.spark.sql.functions._
import graft.queries.OpsQueries

class OpsSpec extends SparkSpecBase {

  test("every ops query runs, keys match oracles") {
    OpsQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
    // every ops query is oracle-paired — q91 joined in round 6 once
    // its contribution sums became DECIMAL-quantized (order-independent).
    // q171 PCA is rows-only BY DESIGN (driver-side eigensolve is not a
    // DuckDB scan; PcaSpec pins its invariants).
    assert(OpsQueries.queries.keySet -- OpsQueries.oracleSql.keySet ==
      Set("q171_pca"))
  }

  test("expectations: clean tables pass; planted violations are counted exactly") {
    import graft.operators.Quality
    val report = OpsQueries.queries("q106_expectations")(spark, sf)
    assert(report.count() == 6)
    assert(report.filter(!col("pass")).count() == 0,
      "generated tables must satisfy every expectation")
    // plant violations and assert exact counts
    val li = Tables.lineitem(spark, sf).limit(10)
      .withColumn("l_quantity", lit(99.0))
    val r2 = Quality.expectations(li,
      Seq("qty" -> (col("l_quantity") > 50), "null_ship" -> col("l_shipdate").isNull))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(r2("qty") == ((10L, false)))
    assert(r2("null_ship") == ((0L, true)))
    // uniqueness counts rows beyond the first per duplicated key
    val dup = Tables.orders(spark, sf).limit(5)
    assert(Quality.checkUnique(dup.unionByName(dup), "u", Seq("o_orderkey"))
      .first().getLong(1) == 5L)
    // fk violations = child keys absent from the parent
    assert(Quality.checkForeignKey(
      Tables.lineitem(spark, sf).limit(20).withColumn("l_orderkey", lit(-1L)),
      Tables.orders(spark, sf), "fk", "l_orderkey", "o_orderkey")
      .first().getLong(1) == 20L)
  }

  test("train split is total, disjoint, and stable across runs") {
    val s1 = OpsQueries.queries("q52_train_split")(spark, sf)
    assert(s1.count() == Tables.documents(spark, sf).count())
    val again = OpsQueries.queries("q52_train_split")(spark, sf)
    assert(s1.exceptAll(again).count() == 0)
    val frac = s1.filter(col("split") === "holdout").count().toDouble / s1.count()
    assert(frac > 0.08 && frac < 0.30, s"holdout fraction $frac out of band")
  }

  test("space-saving sketch under eviction still surfaces the true top items") {
    import graft.functions.GraftFunctions
    import graft.functions.HeavyHitters.heavyHitters
    val words = Tables.documents(spark, sf)
      .select(explode(GraftFunctions.normWords(col("text"))).as("w"))
    // capacity 8 << vocabulary: evictions happen; Space-Saving still
    // guarantees any item with true count > n/capacity is present.
    val hh = words.agg(heavyHitters(col("w"), capacity = 8, k = 5).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"), col("e.max_err"))
      .collect()
    assert(hh.length == 5)
    // Space-Saving guarantees: est over-approximates the true count,
    // and est − err under-approximates it. (Presence of the exact
    // top-k is only guaranteed for items with count > n/capacity —
    // this corpus is near-uniform, so no item qualifies.)
    val exactCounts = words.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    hh.foreach { r =>
      val item = r.getString(0)
      assert(r.getLong(1) >= exactCounts(item),
        s"$item est ${r.getLong(1)} < true ${exactCounts(item)}")
      assert(r.getLong(1) - r.getLong(2) <= exactCounts(item),
        s"$item lower bound violated")
    }
    // a genuinely skewed stream must surface its heavy hitter
    val skewed = spark.range(0, 3000)
      .selectExpr("CASE WHEN id % 3 = 0 THEN 'hot' ELSE concat('t', id) END AS w")
    val top = skewed.agg(heavyHitters(col("w"), capacity = 8, k = 1).as("hh"))
      .select(explode(col("hh")).as("e")).select(col("e.item")).first().getString(0)
    assert(top == "hot")
  }

  test("range join pairs are symmetric-free and within the band") {
    val r = OpsQueries.queries("q51_range_join")(spark, sf)
    assert(r.filter(col("n_close_pairs") <= 0).count() == 0)
  }

  test("embedding truncation: energy in (0,1], cosine consistent, norms ordered") {
    val t = OpsQueries.queries("q122_embed_truncate")(spark, sf)
    assert(t.filter(col("energy_retained") <= 0 || col("energy_retained") > 1).count() == 0)
    assert(t.filter(col("norm16") > col("norm64")).count() == 0,
      "dropping dims can never grow the norm")
    // cos(trunc, full) = sqrt(energy) in closed form — the two derived
    // columns must agree to rounding
    assert(t.filter(abs(col("cos_trunc_full") * col("cos_trunc_full")
      - col("energy_retained")) > 1e-4).count() == 0)
  }

  test("PSI drift terms are non-negative and smoothed shares sum to 1") {
    val p = OpsQueries.queries("q123_psi_drift")(spark, sf)
    assert(p.count() == 5)
    // (p−q)·ln(p/q) ≥ 0 for every bin, by construction of PSI
    assert(p.filter(col("psi_term") < 0).count() == 0)
    val sums = p.agg(sum(col("p_ref")).as("r"), sum(col("p_live")).as("l")).head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-4 &&
      math.abs(sums.getDouble(1) - 1.0) < 1e-4)
  }

  test("incremental aggregate merge equals the direct full rollup") {
    import org.apache.spark.sql.types.DecimalType
    val merged = OpsQueries.queries("q135_incremental_agg")(spark, sf)
    val direct = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("total"),
        unix_micros(max(col("o_orderdate")).cast("timestamp"))
          .as("last_order_us"))
      .orderBy(col("o_custkey"))
    assert(merged.collect().toSeq == direct.collect().toSeq,
      "base ⊕ delta must be indistinguishable from a full recompute")
  }

  test("group centroids: complete grid, counts conserve, mean within group range") {
    val c = OpsQueries.queries("q134_group_centroids")(spark, sf).cache()
    val e = Tables.embeddings(spark, sf)
    val nLabels = e.select("label").distinct().count()
    assert(c.count() == nLabels * 64, "one centroid row per (label, dim)")
    assert(c.agg(sum("n")).head.getLong(0) == e.count() * 64,
      "per-cell counts must partition the value grid")
    val range = e.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos").cast("long").as("dim"))
      .agg(min(col("col").cast("double")).as("lo"),
        max(col("col").cast("double")).as("hi"))
    assert(c.join(range, Seq("label", "dim"))
      .filter(col("centroid") < col("lo") - 1e-6
        || col("centroid") > col("hi") + 1e-6).count() == 0,
      "a mean must lie within its group's range")
    c.unpersist()
  }

  test("q142 embed outliers: p95 gate flags ~5%, never a non-exceeding vector") {
    val o = OpsQueries.queries("q142_embed_outliers")(spark, sf).persist()
    assert(o.count() == Tables.embeddings(spark, sf).count(),
      "every vector gets a verdict")
    // the verdict column is exactly the dist > p95 predicate
    assert(o.filter(col("is_outlier") =!= (col("dist") > col("p95"))).count() == 0)
    // a p95 threshold flags at most ~5% per label (strict > on the
    // interpolated quantile can only flag fewer), and the gate is
    // non-degenerate: some label has at least one outlier
    val per = o.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("is_outlier").cast("long")).as("k")).collect()
    per.foreach { r =>
      assert(r.getLong(2) <= math.ceil(r.getLong(1) * 0.05).toLong + 1,
        s"label ${r.get(0)}: ${r.getLong(2)}/${r.getLong(1)} flagged — p95 gate leaks")
    }
    assert(per.map(_.getLong(2)).sum > 0, "no outliers flagged anywhere")
    o.unpersist()
  }

  test("q193 label noise: vote algebra over k=5 neighborhoods is consistent") {
    val rows = OpsQueries.queries("q193_knn_label_noise")(spark, sf).collect()
    val sliceN = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 300).count()
    assert(rows.length.toLong == sliceN, "one verdict row per sliced vector")
    rows.foreach { r =>
      val (votes, agree) = (r.getAs[Long]("n_votes"), r.getAs[Long]("n_agree"))
      assert(votes >= 1L && votes <= 5L, s"winner votes out of range: $r")
      assert(agree >= 0L && agree <= 5L)
      val suspect = r.getAs[Boolean]("suspect")
      assert(suspect == (r.getAs[Int]("knn_label") != r.getAs[Int]("label")))
      if (!suspect)
        // winner IS the own label, so its vote count is the agreement count
        assert(votes == agree, s"non-suspect vote mismatch: $r")
      else {
        // winner and own label split the 5 neighbors
        assert(votes + agree <= 5L, s"suspect votes overlap: $r")
        // a strict majority (>=3) for the own label always wins the
        // argmax, and the winner never polls below the loser
        assert(agree <= 2L && votes >= agree, s"majority lost the vote: $r")
      }
    }
    assert(rows.exists(_.getAs[Boolean]("suspect")),
      "synthetic labels vs cosine geometry should flag at least one suspect")
  }

  test("q202 join advisor: byte accounting and the broadcast rule") {
    val rows = OpsQueries.queries("q202_join_advisor")(spark, sf).collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val (role, bytes) = (r.getAs[String]("role"), r.getAs[Long]("est_bytes"))
      assert(bytes > r.getAs[Long]("n_rows"),
        s"estimated bytes below one byte/row: $r")
      val expected =
        if (role == "dim" && bytes <= 10485760L) "BROADCAST" else "SHUFFLE"
      assert(r.getAs[String]("advice") == expected, s"advice rule broken: $r")
      if (role == "fact")
        assert(r.getAs[String]("advice") == "SHUFFLE")
      val ratio = r.getAs[Double]("threshold_ratio")
      assert(math.abs(ratio - math.rint(bytes / 10485760.0 * 1e6) / 1e6) < 1e-9)
    }
    // at spec scale every dimension fits comfortably under the threshold
    assert(rows.filter(_.getAs[String]("role") == "dim")
      .forall(_.getAs[String]("advice") == "BROADCAST"))
  }

  test("q208 z-order tiles: every tile covers a small rectangle in BOTH dims") {
    val rows = OpsQueries.queries("q208_zorder_tiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    val o = Tables.orders(spark, sf).agg(
      min(col("o_custkey")).as("mn"), max(col("o_custkey")).as("mx")).head()
    val ckRange = (o.getAs[Long]("mx") - o.getAs[Long]("mn")).toDouble
    val dayMin = rows.map(_.getAs[Long]("day_min")).min
    val dayMax = rows.map(_.getAs[Long]("day_max")).max
    val dayRange = (dayMax - dayMin).toDouble
    // tile = top 3 Morton bits of each dimension → each tile spans at
    // most 1/8 of each normalized range (1/7 allows floor-div slack);
    // a 1-D sort would leave the second dimension spanning ~the full
    // range inside every tile.
    rows.foreach { r =>
      val ckSpan = r.getAs[Long]("ck_max") - r.getAs[Long]("ck_min")
      val daySpan = r.getAs[Long]("day_max") - r.getAs[Long]("day_min")
      assert(ckSpan <= ckRange / 7 + 1, s"tile custkey span too wide: $r")
      assert(daySpan <= dayRange / 7 + 1, s"tile day span too wide: $r")
    }
    // tiles partition all rows
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == Tables.orders(spark, sf).count())
  }
}
