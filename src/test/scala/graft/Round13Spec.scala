package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.queries.{CurationQueries, OpsQueries, RetrievalQueries, TextQueries}

/** Invariants for the round-13 operators (q218–q223). Every one of
  * these is also hash-checked against its DuckDB oracle; the cases
  * here pin the SEMANTIC properties a hash can't name.
  */
class Round13Spec extends SparkSpecBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("q218: per-source doc counts cover the corpus; rates are proper fractions") {
    val r = TextQueries.queries("q218_readability")(spark, sf01).collect()
    val total = Tables.documents(spark, sf01).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == total)
    r.foreach { row =>
      val pct = row.getAs[Double]("pct_hard")
      assert(pct >= 0.0 && pct <= 1.0, s"pct_hard out of range: $row")
      // Flesch is unbounded in theory but the synthetic corpus is
      // ordinary prose; a per-source mean outside [-200, 206.835]
      // means a denominator clamp regressed.
      val avg = row.getAs[Double]("avg_flesch")
      assert(avg > -200.0 && avg <= 206.835, s"avg_flesch implausible: $row")
    }
  }

  test("q219: mined pairs are mutual-best, one per vector on each side, margin > bar") {
    val pairs = RetrievalQueries.queries("q219_bitext_mine")(spark, sf01).collect()
    assert(pairs.nonEmpty, "no bitext pairs mined at sf0.01")
    // one-to-one: a vector appears at most once per side (mutual best)
    val as = pairs.map(_.getAs[Long]("a_id"))
    val bs = pairs.map(_.getAs[Long]("b_id"))
    assert(as.distinct.length == as.length, "a_id repeated — not mutual-best")
    assert(bs.distinct.length == bs.length, "b_id repeated — not mutual-best")
    pairs.foreach { p =>
      assert(p.getAs[Long]("a_id") % 2 == 0 && p.getAs[Long]("b_id") % 2 == 1)
      assert(p.getAs[Double]("margin") > 1.05)
    }
  }

  test("q220: suppression ledger balances and kept groups honor k") {
    val r = CurationQueries.queries("q220_k_anonymity")(spark, sf01).collect()
    val total = Tables.documents(spark, sf01).count()
    assert(r.map(_.getAs[Long]("n_rows")).sum == total)
    r.foreach { row =>
      assert(row.getAs[Long]("rows_kept") + row.getAs[Long]("rows_suppressed") ==
        row.getAs[Long]("n_rows"), s"ledger does not balance: $row")
      val k = row.getAs[Long]("k_achieved")
      assert(k == 0L || k >= 5L, s"kept group below k: $row")
    }
  }

  test("q221: bins partition the ledger exactly and are contiguous from 0") {
    val bins = OpsQueries.queries("q221_compaction_plan")(spark, sf01).collect()
    val nFiles = bins.map(_.getAs[Long]("n_files")).sum
    assert(nFiles == 97L, s"bins cover $nFiles of 97 ledger files")
    val ids = bins.map(_.getAs[Long]("bin")).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L,
      s"bin ids not contiguous: ${ids.mkString(",")}")
    // next-fit by cumulative: every bin except possibly the last
    // overfills only by its boundary file — bin_bytes ≥ target is not
    // guaranteed, but total is conserved exactly.
    val ledgerTotal = Tables.lineitem(spark, sf01)
      .select(round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
      .agg(sum(col("c"))).head.getLong(0)
    assert(bins.map(_.getAs[Long]("bin_bytes")).sum == ledgerTotal)
  }

  test("q222: reported counts conserve n, debiased estimates sum to exactly n, lie rate ≈ 1/4") {
    val r = CurationQueries.queries("q222_rr_privacy")(spark, sf01).collect()
    val n = Tables.events(spark, sf01).count()
    assert(r.map(_.getAs[Long]("reported_count")).sum == n)
    assert(r.map(_.getAs[Long]("true_count")).sum == n)
    // Σ n̂ = (4(m−1)Σobs − m·n)/(3m−4) = n identically — the estimator
    // is self-normalizing; rounding admits 6-dp slack per category.
    val estSum = r.map(_.getAs[Double]("debiased_est")).sum
    assert(math.abs(estSum - n) < 1e-4 * r.length, s"estimates sum to $estSum, n=$n")
    // the md5 coin lies with prob 4/16; uniformity keeps the observed
    // rate near 1/4 at n=10k (loose 5σ-ish bounds)
    val lies = Tables.events(spark, sf01)
      .select((conv(substring(md5(concat(lit("q222:"),
        col("event_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 16 < 4).cast("long").as("lie"))
      .agg(sum(col("lie"))).head.getLong(0)
    val rate = lies.toDouble / n
    assert(rate > 0.2 && rate < 0.3, s"lie rate $rate far from 1/4")
  }

  test("q223: pair verdicts partition n(n-1)/2 and tau is a strong positive correlation") {
    val r = RetrievalQueries.queries("q223_kendall_tau")(spark, sf01).collect()
    r.foreach { row =>
      val n = row.getAs[Long]("n_docs")
      val pairs = row.getAs[Long]("concordant") + row.getAs[Long]("discordant") +
        row.getAs[Long]("n_ties")
      assert(pairs == n * (n - 1) / 2, s"pair ledger wrong: $row")
      val tau = row.getAs[Double]("tau")
      assert(tau >= -1.0 && tau <= 1.0)
      // n_words tracks n_chars closely on prose; a weak tau means a
      // ranker input regressed
      assert(tau > 0.3, s"tau implausibly weak for correlated rankers: $row")
    }
  }

  test("q225: picks are distinct, seeded at 0, covering radius monotone non-increasing") {
    val picks = RetrievalQueries.queries("q225_coreset")(spark, sf01)
      .orderBy(col("step")).collect()
    assert(picks.length == 8)
    assert(picks.head.getAs[Long]("step") == 1L &&
      picks.head.getAs[Long]("vec_id") == 0L && picks.head.isNullAt(2))
    val ids = picks.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 8, s"repeated pick: ${ids.mkString(",")}")
    val radii = picks.tail.map(_.getAs[Long]("radius_u"))
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"covering radius grew: ${radii.mkString(",")}")
    }
    assert(radii.forall(r => r >= 0L && r <= 2000000L),
      "radius outside the [0, 2e6] cosine-distance range")
  }

  test("q226: KMV estimates within O(1/sqrt k) of exact; non-full sketches exact; partition-invariant") {
    import graft.queries.SketchQueries
    val rows = SketchQueries.queries("q226_theta_overlap")(spark, sf01).collect()
    assert(rows.nonEmpty, "no source pairs")
    rows.foreach { r =>
      val (ea, eb) = (r.getAs[Long]("exact_a"), r.getAs[Long]("exact_b"))
      val (eu, ei) = (r.getAs[Long]("exact_union"), r.getAs[Long]("exact_inter"))
      def rel(est: Double, exact: Long): Double =
        math.abs(est - exact) / math.max(1L, exact)
      // k=256 ⇒ 1/sqrt(255) ≈ 6.3% std; 15% is a ~2.4 sigma bar
      assert(rel(r.getAs[Double]("est_a"), ea) <= 0.15, s"est_a off: $r")
      assert(rel(r.getAs[Double]("est_b"), eb) <= 0.15, s"est_b off: $r")
      assert(rel(r.getAs[Double]("est_union"), eu) <= 0.15, s"est_union off: $r")
      // intersection error scales with the UNION size (the common-θ
      // sample covers A∪B), not the intersection itself
      assert(math.abs(r.getAs[Double]("est_inter") - ei) <= 0.15 * eu,
        s"est_inter off: $r")
      assert(math.abs(r.getAs[Double]("est_jaccard") - ei.toDouble / eu) <= 0.1,
        s"est_jaccard off: $r")
      // sketches smaller than k retain every hash — exact by construction
      if (ea < 256) assert(r.getAs[Double]("est_a") == ea.toDouble, s"non-full sketch not exact: $r")
      if (eb < 256) assert(r.getAs[Double]("est_b") == eb.toDouble, s"non-full sketch not exact: $r")
    }
    // mergeability: the aggregate is a set-union keep-k-smallest, so
    // the estimate cannot depend on partitioning
    import graft.functions.{GraftFunctions, KmvFunctions}
    val words = Tables.documents(spark, sf01)
      .select(explode(GraftFunctions.normWords(col("text"))).as("w"))
    def est(parts: Int): Double =
      words.repartition(parts)
        .agg(KmvFunctions.kmvEstimate(
          KmvFunctions.kmvAgg(col("w"), 256)).as("e"))
        .collect().head.getAs[Double]("e")
    assert(est(1) == est(13), "KMV estimate depends on partitioning — merge broken")
  }

  test("q227: matches require the identifier field plus a corroborator; weights are the closed-form sums") {
    import graft.queries.AnalyticQueries
    val rows = AnalyticQueries.queries("q227_record_linkage")(spark, sf01).collect()
    assert(rows.nonEmpty, "no linked pairs at sf0.01")
    rows.foreach { r =>
      assert(r.getAs[Int]("agr_id") == 1,
        s"match without identifier agreement cannot clear 9.0: $r")
      val w = r.getAs[Double]("match_weight")
      // f1 fixed: the only sums ≥ 9.0 are 6526−3184+6409 and 6526+3307+6409
      assert(w == 9.751 || w == 16.242, s"weight not a closed-form sum: $r")
      if (w == 16.242) assert(r.getAs[Int]("agr_bal") == 1 && r.getAs[Int]("agr_sfx") == 1)
      else assert(r.getAs[Int]("agr_bal") == 0 && r.getAs[Int]("agr_sfx") == 1)
    }
  }

  test("q228: bloom pre-filter drops most of lineitem yet the join result is identical without it") {
    import graft.queries.OpsQueries
    import graft.functions.BloomFunctions
    val d = sf01
    val got = OpsQueries.queries("q228_bloom_semijoin")(spark, d).collect()
    // the same aggregate over the PLAIN join (no bloom pre-filter)
    val dim = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val plain = Tables.lineitem(spark, d)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_year"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("o_year")).collect()
    assert(got.toSeq == plain.toSeq, "bloom pre-filter changed the join result")
    // and the filter actually filters: survivors ≪ the full fact table
    val bloom = dim.agg(BloomFunctions.bloomAgg(
      col("o_orderkey").cast("string"), 1 << 17, 5).as("bits"))
    val survivors = Tables.lineitem(spark, d)
      .crossJoin(broadcast(bloom))
      .filter(BloomFunctions.bloomContains(
        col("bits"), col("l_orderkey").cast("string"), 5))
      .count()
    val total = Tables.lineitem(spark, d).count()
    assert(survivors < total / 5,
      s"bloom kept $survivors of $total — not a useful runtime filter")
  }

  test("q229: p3 is a proper fraction, overlap ≤ n_grams, and planted duplicates score ≈ 1") {
    val rows = TextQueries.queries("q229_self_bleu")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, o) = (r.getAs[Long]("n_grams"), r.getAs[Long]("overlap"))
      assert(o >= 0L && o <= n, s"overlap ledger broken: $r")
      val p = r.getAs[Double]("p3")
      assert(p >= 0.0 && p <= 1.0, s"p3 out of range: $r")
    }
    // the testdata plants exact/near duplicates — SOME doc must be
    // fully covered by the rest of the corpus, and diversity must
    // vary (a constant p3 means the totals join collapsed)
    assert(rows.exists(_.getAs[Double]("p3") >= 0.999), "no duplicate-heavy doc found")
    assert(rows.map(_.getAs[Double]("p3")).distinct.length > 10, "p3 suspiciously constant")
  }

  test("q230: window pair count is the closed form; ledgers nest; SNM finds what q227 finds in-window") {
    import graft.queries.AnalyticQueries
    val rows = AnalyticQueries.queries("q230_sorted_neighborhood")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_records")
      // w=4 window (each record pairs with its next ≤3 neighbors):
      // exactly Σ_{i=1..3} max(0, n−i) pairs — the SNM cost model
      val expected = (1 to 3).map(i => math.max(0L, n - i)).sum
      assert(r.getAs[Long]("n_pairs") == expected, s"pair ledger wrong: $r")
      assert(r.getAs[Long]("n_cross_pairs") <= r.getAs[Long]("n_pairs"))
      // three-zone nesting: match ⊆ review ⊆ cross-kind pairs
      assert(r.getAs[Long]("n_matches") <= r.getAs[Long]("n_review"))
      assert(r.getAs[Long]("n_review") <= r.getAs[Long]("n_cross_pairs"))
    }
    // blocking efficiency is the point: the acctbal-sorted window must
    // surface review-tier candidates (id field + a corroborator)
    assert(rows.map(_.getAs[Long]("n_review")).sum > 0,
      "SNM window found no review-tier pairs at sf0.01 — window or weights regressed")
  }

  test("q231: stats are internally consistent (ndv/null ledgers, ordered quartiles, MCV dominates mean)") {
    import graft.queries.OpsQueries
    val rows = OpsQueries.queries("q231_analyze_stats")(spark, sf01).collect()
    assert(rows.length == 3)
    val total = Tables.orders(spark, sf01).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == total)
      assert(r.getAs[Long]("n_nulls") == 0L)
      assert(r.getAs[Long]("ndv") <= total)
    }
    val num = rows.filter(!_.isNullAt(rows.head.fieldIndex("q50")))
    assert(num.length == 2)
    num.foreach { r =>
      val (lo, q25, q50, q75, hi) = (r.getAs[Double]("min_num"),
        r.getAs[Double]("q25"), r.getAs[Double]("q50"),
        r.getAs[Double]("q75"), r.getAs[Double]("max_num"))
      assert(lo <= q25 && q25 <= q50 && q50 <= q75 && q75 <= hi,
        s"quartiles out of order: $r")
    }
    val str = rows.find(_.getAs[String]("col_name") == "o_orderpriority").get
    val (ndv, mcvCnt) = (str.getAs[Long]("ndv"), str.getAs[Long]("mcv_cnt"))
    assert(mcvCnt * ndv >= total, "MCV count below the uniform mean — not the mode")
    assert(str.getAs[String]("min_str") <= str.getAs[String]("mcv"))
  }

  test("q232: HRW movement goes ONLY to the added shards and tracks (M-N)/M") {
    import graft.queries.OpsQueries
    val rows = OpsQueries.queries("q232_rendezvous_reshard")(spark, sf01).collect()
    val total = Tables.documents(spark, sf01).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // the defining HRW property, checked doc-by-doc: a key either
    // keeps its shard or moves to one of the NEW shards 12..15 —
    // never between surviving shards
    def hrw(n: Int) = array_max(transform(sequence(lit(0), lit(n - 1)),
      sh => struct(md5(concat_ws("#", col("doc_id"), sh)).as("h"),
        sh.as("s"))))("s")
    val bad = Tables.documents(spark, sf01)
      .select(hrw(12).as("o"), hrw(16).as("n"))
      .filter(col("n") =!= col("o") && col("n") < 12)
      .count()
    assert(bad == 0L, s"$bad docs moved between SURVIVING shards — not rendezvous hashing")
    val movedFrac = rows.map(_.getAs[Long]("n_moved")).sum.toDouble / total
    assert(math.abs(movedFrac - 0.25) < 0.08,
      f"moved fraction $movedFrac%.3f far from (16-12)/16 = 0.25")
  }

  test("q233: LPA labels are node ids, deterministic under repartitioning, with real communities") {
    import graft.queries.GraphQueries
    val rows = GraphQueries.queries("q233_label_propagation")(spark, sf01).collect()
    val ids = rows.map(_.getAs[Long]("id")).toSet
    assert(rows.map(_.getAs[Long]("lbl")).forall(ids.contains),
      "a propagated label is not a node id")
    val sizes = rows.groupBy(_.getAs[Long]("lbl")).view.mapValues(_.length)
    assert(sizes.values.max > 1, "no community larger than a singleton")
    assert(sizes.size < ids.size, "every node kept its own label — propagation never happened")
    // synchronous + min-tie means the result cannot depend on partitioning
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val again =
      try {
        spark.conf.set(key, "5")
        GraphQueries.queries("q233_label_propagation")(spark, sf01).collect()
      } finally spark.conf.set(key, prev)
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "LPA result moved with the partition count")
  }

  test("q234: weights are a smoothed distribution that upweights above-reference domains") {
    import graft.queries.CurationQueries
    val rows = CurationQueries.queries("q234_doremi_step")(spark, sf01).collect()
    assert(rows.length >= 2)
    val m = rows.length
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum, not 1")
    rows.foreach { r =>
      assert(r.getAs[Double]("excess") >= 0.0)
      assert(r.getAs[Double]("loss") > 0.0)
      // ε-uniform smoothing floor
      assert(r.getAs[Double]("weight") >= 0.01 / m - 1e-9, s"weight below the ε floor: $r")
    }
    // multiplicative weights: a MATERIALLY above-reference domain must
    // get a strictly larger weight than a zero-excess domain (an
    // excess small enough to quantize into u = 1.000000 legitimately
    // ties — the update is exp(0.1·excess) rounded to 6 decimals)
    // excess ≥ 1e-3 ⇒ u ≥ 1.0001 after quantization ⇒ weight shift
    // ≥ ~5e-6, visible at the 6-decimal render; smaller excesses
    // legitimately tie with the zero-excess floor
    val zeroW = rows.filter(_.getAs[Double]("excess") == 0.0).map(_.getAs[Double]("weight"))
    val posW = rows.filter(_.getAs[Double]("excess") >= 1e-3).map(_.getAs[Double]("weight"))
    if (zeroW.nonEmpty && posW.nonEmpty)
      assert(posW.min > zeroW.max, "an above-reference domain was not upweighted")
  }

  test("q235: each point probe opens ~1 of 8 striped files; min/max alone keeps all 8") {
    import graft.queries.OpsQueries
    import graft.sources.{Snapshot, SnapshotStats}
    import SnapshotStats.StatsPred.EqualTo
    val rows = OpsQueries.queries("q235_bloom_point_read")(spark, sf01).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(7L, 123L, 401L))
    val base = OpsQueries.q235SnapshotFor(spark, sf01)
    Seq(7L, 123L, 401L).foreach { k =>
      val (kept, total) = Snapshot.pruneAudit(spark, base, EqualTo("doc_id", k))
      assert(total >= 4, s"fixture should stripe into several files, saw $total")
      assert(kept <= 2, s"bloom kept $kept of $total files for doc_id=$k")
      // and the stats tier alone cannot prune this layout
      val gen = Snapshot.currentGen(spark, base).get
      val stats = SnapshotStats
        .readManifest(spark, s"$base/gen=$gen/_STATS.tsv").get
      assert(stats.count(EqualTo("doc_id", k).mayMatch) == total,
        "striped layout unexpectedly prunable by min/max — fixture broken")
    }
  }

  test("q236: conformal coverage honors the distribution-free guarantee; ledgers consistent") {
    import graft.queries.AnalyticQueries
    val r = AnalyticQueries.queries("q236_conformal")(spark, sf01).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_calib") > 0 && row.getAs[Long]("n_test") > 0)
    assert(row.getAs[Double]("q_hat") >= 0.0)
    assert(row.getAs[Long]("n_covered") <= row.getAs[Long]("n_test"))
    val cov = row.getAs[Double]("coverage")
    // guarantee: E[coverage] ≥ 0.9; finite-sample wobble allows a few
    // points below — 0.8 is a ~3-sigma floor at n_test ≈ 60
    assert(cov >= 0.8 && cov <= 1.0, s"coverage $cov outside plausible band")
    // the interval must be doing work: not everything trivially inside
    assert(row.getAs[Double]("slope") > 0.0,
      "n_chars should grow with n_words — fit regressed")
  }

  test("q237: REP verdicts match the closed-form longest-match semantics per domain") {
    import graft.queries.WebQueries
    val rows = WebQueries.queries("q237_robots_txt")(spark, sf01).collect()
    assert(rows.length == 10)
    // recompute expected verdicts from first principles: path case
    // c = id%4, domain i = id%10; allowed ⇔ c==3 (no rule) or
    // c==0 on even domains (Allow /private/public outranks
    // Disallow /private) or c==2 where no /tmp rule exists (i%3≠0)
    val ids = Tables.documents(spark, sf01).select("doc_id")
      .collect().map(_.getLong(0))
    val expect = ids.groupBy(id => s"d${id % 10}").view.mapValues { g =>
      val allowed = g.count { id =>
        val (c, i) = ((id % 4).toInt, (id % 10).toInt)
        c == 3 || (c == 0 && i % 2 == 0) || (c == 2 && i % 3 != 0)
      }
      (g.length.toLong, allowed.toLong)
    }.toMap
    rows.foreach { r =>
      val dom = r.getAs[String]("domain")
      val (n, allowed) = expect(dom)
      assert(r.getAs[Long]("n_urls") == n, s"url count wrong for $dom")
      assert(r.getAs[Long]("n_allowed") == allowed,
        s"$dom: got ${r.getAs[Long]("n_allowed")} allowed, REP says $allowed")
      assert(r.getAs[Long]("n_allowed") + r.getAs[Long]("n_blocked") == n)
    }
  }

  test("q238: the planted homoglyph cluster is recovered; exact dups stay out") {
    val rows = TextQueries.queries("q238_homoglyph_audit")(spark, sf01).collect()
    val planted = rows.filter(_.getAs[Long]("min_doc") == 3700000L)
    assert(planted.length == 1, "planted evasion cluster not found")
    val c = planted.head
    assert(c.getAs[Long]("n_docs") == 3L && c.getAs[Long]("n_raw") == 3L,
      s"cluster should hold the original + 2 substituted twins: $c")
    assert(c.getAs[Long]("max_doc") == 3700003L)
    // the ascii control has no twin and must not surface
    assert(!rows.exists(r => r.getAs[Long]("min_doc") == 3700002L))
  }

  test("q239: l-diversity ledgers cover the corpus and nest") {
    import graft.queries.CurationQueries
    val rows = CurationQueries.queries("q239_l_diversity")(spark, sf01).collect()
    val total = Tables.documents(spark, sf01).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("groups_violating") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("rows_at_risk") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("min_diversity") >= 1L)
    }
  }

  test("q240: transition rows are stochastic and the pair count is users' (n-1) sums") {
    import graft.queries.BehaviorQueries
    val rows = BehaviorQueries.queries("q240_markov_transitions")(spark, sf01).collect()
    assert(rows.nonEmpty)
    // each from-row's probabilities sum to 1 (up to the 6-dec render)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
      val ps = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(ps - 1.0) <= rs.length * 5e-7 + 1e-9,
        s"row $ft sums to $ps")
    }
    // every user with k events contributes exactly k-1 transitions
    val ev = Tables.events(spark, sf01)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected,
      "transition count != Σ_users (n_events − 1)")
  }

  test("q241: bootstrap intervals are ordered, non-degenerate, and bracket the point mean") {
    import graft.queries.AnalyticQueries
    val rows = AnalyticQueries.queries("q241_poisson_bootstrap")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, m) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
        r.getAs[Double]("mean_chars"))
      assert(lo < hi, s"degenerate interval: $r")
      // resample means center on the sample mean; the ~94% interval
      // bracketing it is the sanity floor, not a probabilistic claim
      assert(lo <= m && m <= hi, s"point mean outside its own CI: $r")
      // and the interval is doing work: materially narrower than the
      // full data range, wider than zero
      assert((hi - lo) / m < 1.0, s"implausibly wide CI: $r")
    }
  }

  test("q242: frequency-of-frequency ledgers nest; r* nulls exactly on empty denominators") {
    val rows = TextQueries.queries("q242_good_turing")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"))
      val (n1, n2, n3) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("n3"))
      assert(v <= n && n1 + n2 + n3 <= v, s"ledger broken: $r")
      val um = r.getAs[Double]("unseen_mass")
      assert(um >= 0.0 && um < 1.0, s"unseen mass out of range: $r")
      // the smoothed count is defined iff its denominator count exists
      assert(r.isNullAt(r.fieldIndex("r_star_1")) == (n1 == 0L), s"r*₁ null contract: $r")
      assert(r.isNullAt(r.fieldIndex("r_star_2")) == (n2 == 0L), s"r*₂ null contract: $r")
    }
  }
}
