package graft

import org.apache.spark.sql.functions._

import graft.functions.{KllDoubleSketch, KllQuantiles}

/** KLL-ladder quantile sketch invariants: exact weight conservation,
  * bounded retained size, rank-error bounds vs exact quantiles, and
  * stability of those bounds under different partitionings (the
  * map-side-merge path).
  */
class QuantileSketchSpec extends SparkSpecBase {
  import spark.implicits._

  private def exactQuantile(sorted: Array[Double], q: Double): Double =
    sorted(math.min(sorted.length - 1,
      math.max(0, math.ceil(q * sorted.length).toInt - 1)))

  private def rankOf(sorted: Array[Double], v: Double): Double = {
    // fraction of items ≤ v
    val idx = sorted.count(_ <= v)
    idx.toDouble / sorted.length
  }

  test("sketch conserves total weight exactly through compactions") {
    val sk = new KllDoubleSketch(50)
    val n = 20000
    (1 to n).foreach(i => sk.add((i * 2654435761L % 100003).toDouble))
    assert(sk.totalN == n)
    val weight = sk.levels.zipWithIndex.map { case (buf, lvl) =>
      buf.size.toLong * (1L << lvl)
    }.sum
    assert(weight == n, s"ladder weight $weight must equal n=$n")
    assert(sk.retained < 50 * 20,
      s"retained ${sk.retained} must stay O(k log n), not O(n)")
  }

  test("driver-side sketch: ≤2% rank error at k=200 on 50k skewed values") {
    val values = (1 to 50000).map { i =>
      val u = (i * 2654435761L % 1000003).toDouble / 1000003.0
      math.pow(u, 3) * 1000.0 // cubed → heavy left skew
    }.toArray
    val sk = new KllDoubleSketch(200)
    values.foreach(sk.add)
    val sorted = values.sorted
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val est = sk.quantiles(Seq(q)).head
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= 0.02, s"q=$q est=$est rank err $err > 2%")
    }
  }

  test("merge path (4-way) keeps the same rank-error bound and exact n") {
    val values = (1 to 50000).map(i =>
      (i * 40503L % 65537).toDouble).toArray
    val parts = values.grouped(12500).toSeq
    val sketches = parts.map { p =>
      val s = new KllDoubleSketch(200); p.foreach(s.add); s
    }
    val merged = sketches.reduce { (a, b) => a.merge(b); a }
    assert(merged.totalN == 50000)
    val sorted = values.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.quantiles(Seq(q)).head
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= 0.02, s"merged q=$q rank err $err > 2%")
    }
  }

  test("aggregate over events: n exact, estimates within 2% rank of exact per group") {
    val ev = Tables.events(spark, sf).select(col("event_type"), col("value"))
    val out = ev.groupBy(col("event_type"))
      .agg(KllQuantiles.kllQuantiles(col("value"), 200,
        Seq(0.1, 0.5, 0.9)).as("sk"))
      .select(col("event_type"), col("sk.n").as("n"), col("sk.ests").as("ests"))
      .collect()
    val exact = ev.collect().groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getDouble(1)).sorted }
    assert(out.nonEmpty)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val sorted = exact(et)
      assert(r.getAs[Long]("n") == sorted.length.toLong)
      r.getAs[Seq[org.apache.spark.sql.Row]]("ests").foreach { e =>
        val q = e.getDouble(0); val est = e.getDouble(1)
        val err = math.abs(rankOf(sorted, est) - q)
        assert(err <= 0.02, s"$et q=$q rank err $err")
      }
    }
  }

  test("repartitioning changes merge order but not the error bound") {
    val ev = Tables.events(spark, sf).select(col("value"))
    val exactSorted = ev.as[Double].collect().sorted
    for (parts <- Seq(1, 7)) {
      val est = ev.repartition(parts)
        .agg(KllQuantiles.kllQuantiles(col("value"), 200, Seq(0.5)).as("sk"))
        .select(col("sk.ests")(0)("est")).as[Double].head()
      val err = math.abs(rankOf(exactSorted, est) - 0.5)
      assert(err <= 0.02, s"parts=$parts median rank err $err")
    }
  }

  // --- count-min sketch (q217, functions/CountMin.scala) ---

  test("count-min: est ≥ exact always; overcount bounded; merge ≡ one pass") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{CmsOps, CmsSketch}
    // forced-collision domain: 5000 distinct keys into 4×64 counters
    val depth = 4; val width = 64
    val full = new CmsSketch(depth, width)
    val a = new CmsSketch(depth, width)
    val b = new CmsSketch(depth, width)
    val exact = scala.collection.mutable.Map[String, Long]()
    val n = 20000
    (0 until n).foreach { i =>
      val key = s"k${(i * 7919) % 5000}"
      val u = UTF8String.fromString(key)
      full.add(u, 1L)
      (if (i % 2 == 0) a else b).add(u, 1L)
      exact(key) = exact.getOrElse(key, 0L) + 1L
    }
    assert(full.total == n)
    a.merge(b)
    // cell-wise additive merge is EXACT: merged state == one-pass state
    assert(a.counts.sameElements(full.counts) && a.total == full.total,
      "merge must equal the single-pass build cell for cell")
    var over = 0L
    val bytes = full.serialize()
    exact.foreach { case (k, c) =>
      val u = UTF8String.fromString(k)
      val est = full.estimate(u)
      assert(est >= c, s"$k: est $est < exact $c — CMS can never undercount")
      // serialized codegen-path estimator agrees with the live sketch
      assert(CmsOps.estimate(bytes, u, depth, width) == est)
      over += est - c
    }
    assert(over > 0, "5000 keys in 64 cells must actually collide")
    // ε·N bound with ε = e/width, checked on the MEAN overcount (the
    // per-key bound is probabilistic; the mean is far inside it)
    assert(over.toDouble / exact.size <= math.E / width * n,
      s"mean overcount ${over / exact.size} exceeds eN/width")
  }

  test("q217 publishes est ≥ exact with non-negative overcounts") {
    val rows = graft.queries.SketchQueries
      .queries("q217_cms_freq")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"))
      assert(r.getAs[Long]("overcount") ==
        r.getAs[Long]("est") - r.getAs[Long]("exact"))
    }
  }

  test("count-min inner product: est ≥ exact join size; bounded; zero on disjoint keys") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{CmsOps, CmsSketch}
    val depth = 4; val width = 64
    val a = new CmsSketch(depth, width)
    val b = new CmsSketch(depth, width)
    val ca = scala.collection.mutable.Map[String, Long]()
    val cb = scala.collection.mutable.Map[String, Long]()
    val na = 6000; val nb = 9000
    (0 until na).foreach { i =>
      val k = s"k${(i * 7919) % 500}"
      a.add(UTF8String.fromString(k), 1L); ca(k) = ca.getOrElse(k, 0L) + 1L
    }
    (0 until nb).foreach { i =>
      // keys k0..k349 overlap A's domain; j0.. are B-only
      val k = if (i % 3 == 0) s"j${i % 700}" else s"k${(i * 104729) % 350}"
      b.add(UTF8String.fromString(k), 1L); cb(k) = cb.getOrElse(k, 0L) + 1L
    }
    val exact = ca.iterator.map { case (k, c) => c * cb.getOrElse(k, 0L) }.sum
    val est = CmsOps.innerProduct(a.serialize(), b.serialize(), depth, width)
    assert(est >= exact, s"inner product $est < exact join size $exact")
    // CM §4.2 bound: est ≤ exact + (e/width)·Na·Nb w.h.p. — check with
    // the deterministic data (collisions are forced: 850 keys, 64 cells)
    assert(est <= exact + (math.E / width * na * nb).toLong,
      s"overcount ${est - exact} exceeds the e/width·Na·Nb bound")
    // fully disjoint small domains that happen not to collide → exact 0
    val p = new CmsSketch(depth, width)
    val q = new CmsSketch(depth, width)
    p.add(UTF8String.fromString("only-in-p"), 3L)
    q.add(UTF8String.fromString("only-in-q"), 5L)
    val dEst = CmsOps.innerProduct(p.serialize(), q.serialize(), depth, width)
    assert(dEst == 0L || dEst == 15L, // 15 only if all 4 rows collide — impossible odds
      s"disjoint-key estimate $dEst")
    assert(dEst == 0L, "one of 4 rows must separate two keys in 64 cells")
  }

  test("q224 publishes est ≥ exact with the ledger's overcount arithmetic") {
    val r = graft.queries.SketchQueries
      .queries("q224_join_size_est")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("exact_pairs") > 0L, "join must be non-empty at sf0.001")
    assert(row.getAs[Long]("est_pairs") >= row.getAs[Long]("exact_pairs"))
    assert(row.getAs[Long]("overcount") ==
      row.getAs[Long]("est_pairs") - row.getAs[Long]("exact_pairs"))
    assert(row.getAs[Double]("rel_err") >= 0.0)
  }
}
