package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomFunctions, BloomOps, BloomSketch, GraftFunctions}
import graft.operators.TextAnalysis
import graft.queries.CurationQueries
import org.apache.spark.unsafe.types.UTF8String

/** SURVEY §2.3 round-3 curation operators: dedup-apply, entropy,
  * curriculum selection, quota sampling, Bloom decontamination.
  */
class CurationSpec extends SparkSpecBase {

  private def q(name: String) = CurationQueries.queries(name)(spark, sf)

  test("bloom filter: no false negatives, bounded false positives") {
    val sk = new BloomSketch(1 << 14, 5)
    val items = (0 until 1000).map(i => UTF8String.fromString(s"item-$i"))
    items.foreach(sk.add)
    assert(items.forall(it => BloomOps.mightContain(sk.bits, it, 5)),
      "a Bloom filter must never miss an inserted item")
    val probes = (0 until 10000).map(i => UTF8String.fromString(s"absent-$i"))
    val fp = probes.count(p => BloomOps.mightContain(sk.bits, p, 5))
    // k=5, n=1000, m=16384 → theoretical fp ≈ (1-e^{-5000/16384})^5 ≈ 0.2%
    assert(fp < 200, s"false-positive rate too high: $fp/10000")
  }

  test("bloom sketches merge like set union") {
    val a = new BloomSketch(1 << 10, 3); a.add(UTF8String.fromString("x"))
    val b = new BloomSketch(1 << 10, 3); b.add(UTF8String.fromString("y"))
    a.merge(b)
    assert(BloomOps.mightContain(a.bits, UTF8String.fromString("x"), 3))
    assert(BloomOps.mightContain(a.bits, UTF8String.fromString("y"), 3))
  }

  test("charEntropy matches the closed form") {
    // "aabb": p=0.5 each → 1 bit; "abcd": 2 bits; "aaaa": 0
    assert(graft.functions.TextOps.charEntropy(UTF8String.fromString("aabb")) == 1.0)
    assert(graft.functions.TextOps.charEntropy(UTF8String.fromString("abcd")) == 2.0)
    assert(graft.functions.TextOps.charEntropy(UTF8String.fromString("aaaa")) == 0.0)
    assert(graft.functions.TextOps.charEntropy(UTF8String.fromString("")) == 0.0)
  }

  test("charEntropy counts code points, not UTF-16 units (non-BMP safe)") {
    // two distinct emoji (each a surrogate pair), 2+2 → 1 bit exactly;
    // a code-unit counter would see the shared high surrogate and
    // produce a different distribution over 8 units.
    assert(graft.functions.TextOps.charEntropy(UTF8String.fromString("😀😀🚀🚀")) == 1.0)
    // single repeated emoji → 0 bits
    assert(graft.functions.TextOps.charEntropy(UTF8String.fromString("😀😀")) == 0.0)
  }

  test("boilerplate removal empties fully-duplicated docs, keeps fresh ones intact") {
    val out = graft.queries.TextQueries.queries("q104_boilerplate_removal")(spark, sf)
    // the 50 planted copies AND their originals are pure boilerplate
    val planted = out.filter(col("doc_id") < 50 or col("doc_id") >= 1000000)
    assert(planted.count() == 100)
    assert(planted.filter(col("n_kept") =!= 0 or col("clean_text") =!= "").count() == 0)
    // unduplicated docs keep every full tile unless a tile organically
    // repeats — the corpus-wide kept fraction must stay high
    val fresh = out.filter(col("doc_id") >= 50 and col("doc_id") < 1000000)
    val totals = fresh.agg(sum("n_tiles"), sum("n_kept")).first()
    assert(totals.getLong(1) > (totals.getLong(0) * 0.9).toLong,
      s"fresh docs lost too many tiles: ${totals.getLong(1)}/${totals.getLong(0)}")
    // reassembly preserves tile order: clean_text word count = 5 * n_kept
    assert(out.filter(col("n_kept") > 0 and
      size(split(col("clean_text"), " ")) =!= col("n_kept") * 5).count() == 0)
  }

  test("budgetSelect's distributed prefix sum equals the naive global window") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Selection, TextAnalysis}
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val ranked = TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("distinct_ratio"))
      .join(TextAnalysis.tokenCounts(docs, "doc_id", "text")
        .select(col("doc_id"), col("ws_tokens")), "doc_id")
    val sortCols = Seq(col("distinct_ratio").desc, col("doc_id").asc)
    val got = Selection.budgetSelect(ranked, sortCols, col("ws_tokens"), 15000L)
      .select(col("doc_id"), col("cum_weight"))
      .as[(Long, Long)].collect().toMap
    val naive = ranked.withColumn("cum",
        sum(col("ws_tokens").cast("long")).over(Window.orderBy(sortCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") <= 15000L)
      .select(col("doc_id"), col("cum"))
      .as[(Long, Long)].collect().toMap
    assert(got == naive)
    assert(got.nonEmpty && got.values.max <= 15000L)
    assert(got.size < ranked.count(), "budget should bind at sf0.001+")
  }

  test("weighted sample is reproducible and keep rate tracks the weights") {
    val s1 = q("q109_weighted_sample").collect().map(_.getLong(0)).toSeq
    val s2 = q("q109_weighted_sample").collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "weighted sample must be deterministic")
    val total = Tables.documents(spark, sf).count()
    assert(s1.nonEmpty && s1.size < total, "sample must be a proper subset")
    // mean keep_p estimates the keep rate: they must agree loosely
    val meanP = q("q109_weighted_sample")
      .agg(avg("keep_p")).first().getDouble(0)
    val rate = s1.size.toDouble / total
    // kept rows over-represent high-p docs, so rate >= overall mean p
    // is not guaranteed row-wise — just bound the gap coarsely
    assert(math.abs(rate - meanP) < 0.35, s"rate $rate vs mean keep_p $meanP")
  }

  test("grouped split never straddles a source across train/holdout") {
    val out = q("q105_grouped_split")
    val straddled = out.select("source", "split").distinct()
      .groupBy("source").count().filter(col("count") > 1)
    assert(straddled.count() == 0)
    // both splits are non-empty (sources hash to both sides)
    assert(out.select("split").distinct().count() == 2)
  }

  test("q80 entropy is positive and bounded for real documents") {
    val rows = q("q80_entropy").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val h = r.getDouble(1); h >= 0.0 && h <= 8.0 // ≤ log2(alphabet) bits/char
    })
  }

  test("q79 dedup-apply removes planted copies and keeps their canonicals") {
    val kept = q("q79_dedup_apply").collect().map(_.getLong(0)).toSet
    // planted copies are doc_id >= 1000000 (exact text duplicates of
    // 0..49): every copy clusters with its original, whose id is
    // smaller, so no copy can ever be its cluster's canonical.
    assert(!(1000000L until 1000050L).exists(kept.contains), "planted copies must be removed")
    // doc 0 is the global minimum id — nothing can outrank it as canonical.
    assert(kept.contains(0L), "the global-minimum doc is always canonical")
    // base docs removed (near-dups among the organic corpus) stay a
    // small fraction; the bulk of the corpus is untouched.
    val baseTotal = Tables.documents(spark, sf).count()
    assert(kept.size >= baseTotal * 8 / 10, s"kept ${kept.size} of $baseTotal base docs")
  }

  test("q81 curriculum top-k emits at most 5 per language, rank-dense") {
    val rows = q("q81_curriculum_topk").collect()
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.nonEmpty)
    byLang.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length.toLong))
    }
  }

  test("q82 quota sample takes exactly min(50, stratum size) per language") {
    val docs = Tables.documents(spark, sf)
    val strata = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q("q82_quota_sample").collect().groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.length.toLong }
    assert(got == strata.map { case (l, n) => l -> math.min(50L, n) })
  }

  test("q83 bloom decontamination never misses an exactly-contaminated doc") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val planted = docs.unionByName(docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val corpus = planted.filter(col("doc_id") >= 20)
    val bench = planted.filter(col("doc_id") < 20)
    val exact = TextAnalysis.contamination(corpus, bench, "doc_id", "text", n = 8)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val bloomed = q("q83_bloom_decontam").collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty, "planted copies of docs 20..49 share all shingles with bench? need real positives")
    assert(exact.subsetOf(bloomed), s"bloom missed ${exact -- bloomed}")
    // over-flagging stays bounded: the filter is sized for ~0.2% fp/shingle
    assert(bloomed.size <= exact.size + math.max(5, exact.size / 2),
      s"bloom over-flagged: ${bloomed.size} vs exact ${exact.size}")
  }

  test("contamination dispatcher routes small benchmarks exact, large to Bloom") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") >= 20)
    val bench = docs.filter(col("doc_id") < 20)
    // generous threshold → exact path: per-row array_intersect in plan
    val small = TextAnalysis.contamination(corpus, bench, "doc_id", "text", n = 8)
    assert(small.queryExecution.analyzed.toString.contains("array_intersect"),
      "small benchmark should take the exact array_intersect path")
    val exactIds = TextAnalysis.contaminationExact(corpus, bench, "doc_id", "text", n = 8)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(small.select(col("doc_id")).collect().map(_.getLong(0)).toSet == exactIds)
    // tiny threshold → Bloom path: O(1) probes, renamed output column,
    // never misses an exact hit
    val big = TextAnalysis.contamination(corpus, bench, "doc_id", "text", n = 8,
      maxExactShingles = 10)
    val bigPlan = big.queryExecution.analyzed.toString
    // round 17: the Bloom probe is the fused per-row array kernel
    // (graft_bloom_count_contained), not the per-element lambda probe
    assert(bigPlan.contains("graft_bloom_count_contained") &&
      !bigPlan.contains("array_intersect"),
      "over-threshold benchmark should take the Bloom path")
    assert(big.columns.toSeq == Seq("doc_id", "n_contaminated"))
    val bloomIds = big.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(exactIds.subsetOf(bloomIds), s"bloom path missed ${exactIds -- bloomIds}")
  }

  test("mixing weights: rates capped at 1, expected tokens conserve the budget") {
    val m = q("q116_mix_weights")
    assert(m.filter(col("keep_rate") > 1.0 || col("keep_rate") <= 0.0).count() == 0)
    assert(m.filter(col("expected_tokens") > col("src_tokens")).count() == 0,
      "downsampling can never add tokens")
    // each source's post-sampling share must not exceed the equal-share
    // target (under-represented sources keep less than the target)
    val row = m.agg(sum(col("expected_tokens")).as("e"),
      sum(col("src_tokens")).cast("double").as("t")).head()
    assert(row.getDouble(0) <= row.getDouble(1) + 1e-6)
  }

  test("DSIR selection enriches the target distribution") {
    val sel = q("q118_dsir_select")
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val joined = sel.join(docs, "doc_id")
    val selEn = joined.filter(col("lang") === "en").count().toDouble / sel.count()
    val baseEn = docs.filter(col("lang") === "en").count().toDouble / docs.count()
    // importance weighting toward the English target must beat the base
    // rate (margin is modest: the synthetic corpus shares vocabulary
    // across langs, so the hashed-unigram signal is real but not sharp)
    assert(selEn > baseEn + 0.05,
      f"selected en-fraction $selEn%.3f not above base $baseEn%.3f")
    assert(sel.count() == 200)
  }

  test("source-overlap matrix is a valid Jaccard upper triangle") {
    val m = q("q124_source_overlap")
    assert(m.count() == 190) // C(20, 2) source pairs, zero-overlap included
    assert(m.filter(col("s1") >= col("s2")).count() == 0, "not upper-triangular")
    assert(m.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    assert(m.filter(col("n_inter") > least(col("n_a"), col("n_b"))).count() == 0,
      "intersection exceeds a set size")
  }

  test("q83 plan has no shuffle on the corpus probe side") {
    val plan = q("q83_bloom_decontam").queryExecution.executedPlan.toString
    // the only exchanges allowed are the 1-row filter aggregation and the
    // final sort; the corpus side joins via broadcast-nested-loop.
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast of the filter bits, got:\n$plan")
  }

  test("topic assignment: total, centroids self-assign at cos 1, no window") {
    val a = q("q125_topic_assign")
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(a.count() == nVecs, "every vector must receive exactly one topic")
    val self = a.filter(col("vec_id") < 8)
      .filter(col("topic_id") =!= col("vec_id") || col("cos_sim") =!= 1.0)
    assert(self.count() == 0, "a centroid's nearest centroid is itself")
    assert(a.filter(col("cos_sim") < -1.0 || col("cos_sim") > 1.0).count() == 0)
    val plan = a.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"argmax must be a partial aggregate, not a window:\n$plan")
  }

  test("vocab coverage: token totals conserve and a bigger vocab covers more") {
    val cov = q("q126_vocab_coverage")
    assert(cov.filter(col("n_covered") > col("n_tokens")).count() == 0)
    assert(cov.filter(col("coverage") < 0 || col("coverage") > 1).count() == 0)
    val totTokens = cov.agg(sum(col("n_tokens"))).head.getLong(0)
    val exploded = Tables.documents(spark, sf)
      .select(explode(graft.functions.GraftFunctions.normWords(col("text"))))
      .count()
    assert(totTokens == exploded, "per-source token counts must partition the corpus")
    // the probe must reach the corpus as a broadcast, never a shuffle join
    val plan = cov.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab probe should broadcast the 512-row vocab:\n$plan")
  }

  test("winsorized stats: bounds are real disc quantiles and contain the mean") {
    val w = q("q127_winsorized_stats")
    assert(w.filter(col("lo") > col("hi")).count() == 0)
    assert(w.filter(col("win_mean") < col("lo") || col("win_mean") > col("hi"))
      .count() == 0, "a clipped mean must lie inside the clip interval")
    // disc quantiles are VALUES FROM THE DATA, not interpolations
    val docs = Tables.documents(spark, sf).select(col("source"), col("n_chars"))
    val loMiss = w.select(col("source"), col("lo").as("n_chars"))
      .join(docs, Seq("source", "n_chars"), "left_anti").count()
    val hiMiss = w.select(col("source"), col("hi").as("n_chars"))
      .join(docs, Seq("source", "n_chars"), "left_anti").count()
    assert(loMiss == 0 && hiMiss == 0, "quantile bound not an observed value")
    val n = w.agg(sum(col("n"))).head.getLong(0)
    assert(n == docs.count(), "per-source n must partition the corpus")
  }

  test("cluster canonical: one best-quality canonical per cluster, copies clustered") {
    val c = q("q128_cluster_canonical").cache()
    val perCluster = c.groupBy(col("cluster_id"))
      .agg(countDistinct(col("canonical_id")).as("nc"),
        sum(col("is_canonical").cast("long")).as("nk"))
    assert(perCluster.filter(col("nc") =!= 1 || col("nk") =!= 1).count() == 0,
      "every cluster needs exactly one canonical, flagged exactly once")
    // every planted copy shares a cluster with its original
    val planted = c.filter(col("doc_id") >= 1000000)
      .select((col("doc_id") - 1000000).as("doc_id"), col("cluster_id"))
    assert(planted.join(c, Seq("doc_id", "cluster_id"), "left_anti").count() == 0,
      "a planted copy landed in a different cluster than its original")
    // the canonical is a max-quality member of its own cluster
    // (same construction as TextQueries.plantedCorpus, which is private)
    val docs0 = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val corpus = docs0.unionByName(docs0.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val quality = graft.operators.TextAnalysis.qualityScore(corpus, "doc_id", "text")
      .select(col("doc_id"), col("distinct_ratio"))
    val memberQ = c.join(quality, "doc_id")
    val canonQ = c.filter(col("is_canonical"))
      .join(quality, "doc_id")
      .select(col("cluster_id"), col("distinct_ratio").as("canon_q"))
    assert(memberQ.join(canonQ, "cluster_id")
      .filter(col("distinct_ratio") > col("canon_q")).count() == 0,
      "a non-canonical member outranks its canonical")
    c.unpersist()
  }

  test("curation chain: verdicts partition the corpus and respect stage order") {
    val v = q("q136_curation_chain").cache()
    assert(v.count() == Tables.documents(spark, sf).count(),
      "every doc must receive exactly one verdict")
    val allowed = Set("benchmark", "quality", "dup", "contam", "budget", "kept")
    assert(v.select("verdict").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(allowed))
    // kept docs carry a monotone budgeted cum; nothing else does
    assert(v.filter(col("verdict") === "kept")
      .filter(col("cum_tokens").isNull || col("cum_tokens") > 15000).count() == 0)
    assert(v.filter(col("verdict") =!= "kept")
      .filter(col("cum_tokens").isNotNull).count() == 0)
    // the budget binds: kept tokens fit, and the next-best doc would not
    val keptTok = v.filter(col("verdict") === "kept")
      .agg(sum("ws_tokens")).head.getLong(0)
    assert(keptTok <= 15000, s"kept docs hold $keptTok tokens > budget")
    // benchmark docs never re-enter the corpus stages
    assert(v.filter(col("doc_id") < 20)
      .filter(col("verdict") =!= "benchmark").count() == 0)
    v.unpersist()
  }

  test("q139 encoding audit: planted mojibake verdicts, ASCII corpus all clean") {
    val v = graft.queries.TextQueries.queries("q139_mojibake")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(v(9300001L) == "corrupt") // dense Ã©/â€” mojibake
    assert(v(9300002L) == "corrupt") // smart-punct mojibake + Â
    assert(v(9300003L) == "clean") // real accents must NOT flag
    assert(v(9300004L) == "corrupt") // U+FFFD decode failures
    assert(v(9300005L) == "suspect") // one artifact in a long doc: rate < bar
    assert(v.filter(_._1 < 9300000L).values.forall(_ == "clean"),
      "the ASCII base corpus must audit clean")
  }

  test("q140 contamination score: planted benchmark copies are dirty at frac 1.0") {
    val sc = graft.queries.TextQueries.queries("q140_contam_score")(spark, sf)
    val planted = sc.filter(col("doc_id") >= 1000000L && col("doc_id") < 1000020L)
      .collect()
    assert(planted.length == 20, "all 20 planted benchmark copies must score")
    planted.foreach { r =>
      assert(r.getAs[String]("verdict") == "dirty"
        && r.getAs[Double]("contam_frac") == 1.0,
        s"planted copy ${r.getAs[Long]("doc_id")} must be fully contaminated")
    }
    assert(sc.filter(col("n_contaminated") > col("n_shingles")).count() == 0)
    assert(sc.filter(col("verdict") === "clean" && col("n_contaminated") > 0)
      .count() == 0, "clean verdict requires zero overlap")
  }

  test("q141 fertility: BPE pre-tokens can only fragment, never merge") {
    val f = graft.queries.TextQueries.queries("q141_fertility")(spark, sf).collect()
    assert(f.length == 5, "one row per language")
    f.foreach { r =>
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"),
        s"${r.getAs[String]("lang")}: BPE splits within whitespace tokens")
      assert(r.getAs[Double]("fertility_ratio") >= 1.0)
      assert(r.getAs[Long]("n_bytes") > 0 && r.getAs[Long]("n_docs") > 0)
    }
    assert(f.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, sf).count())
  }

  test("q143 source scorecard: counts conserve and rates recompute") {
    val sc = q("q143_source_scorecard").persist()
    val docs = Tables.documents(spark, sf)
    assert(sc.count() == docs.select("source").distinct().count(),
      "one row per source")
    assert(sc.agg(sum(col("n_docs"))).head.getLong(0) == docs.count(),
      "doc counts must partition the corpus")
    assert(sc.filter(col("n_dup") > col("n_docs") || col("n_keep") > col("n_docs"))
      .count() == 0)
    assert(sc.filter(
      col("dup_rate") =!= round(col("n_dup").cast("double") / col("n_docs"), 6)
        || col("keep_rate") =!= round(col("n_keep").cast("double") / col("n_docs"), 6))
      .count() == 0, "rates must recompute from their counts")
    sc.unpersist()
  }

  test("q145 dup profile: planted exact copies are fully duplicated mass") {
    val p = graft.queries.TextQueries.queries("q145_dup_profile")(spark, sf).persist()
    // every planted copy AND its original consists entirely of shared
    // shingles — both sides of each planted pair read dup_heavy at 1.0
    val planted = p.filter(col("doc_id") >= 1000000L || col("doc_id") < 50)
    assert(planted.count() > 0)
    assert(planted.filter(col("verdict") =!= "dup_heavy" || col("dup_frac") =!= 1.0)
      .count() == 0, "exact copies must profile as fully duplicated")
    assert(p.filter(col("n_dup") > col("n_shingles")).count() == 0)
    assert(p.filter(col("verdict") === "unique" && col("n_dup") > 0).count() == 0)
    p.unpersist()
  }

  test("q146 split uniformity: md5 buckets pass the chi-square gate") {
    val u = graft.queries.TextQueries.queries("q146_split_uniformity")(spark, sf)
      .collect()
    assert(u.length == 16, "one row per hex bucket")
    val total = u.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count(), "bucket counts conserve")
    val chi2 = u.map(_.getAs[Double]("chi_term")).sum
    // χ²(15 df) 99.9th percentile ≈ 37.7 — a uniform hash sits far
    // below; a biased splitter (e.g. mod on sequential ids with
    // skewed ranges) blows through it
    assert(chi2 < 37.7, s"chi-square $chi2 — splitter looks biased")
  }

  test("dup leakage: unordered source pairs conserve the LSH pair count") {
    val lk = q("q130_dup_leakage")
    assert(lk.filter(col("s1") > col("s2")).count() == 0, "pairs must be unordered")
    assert(lk.filter(col("cross_source") =!= (col("s1") =!= col("s2"))).count() == 0)
    val docs = Tables.documents(spark, sf)
    val pairs = graft.operators.Dedup.lshCandidatePairs(
      graft.operators.Dedup.lshBandsMd5Narrow(docs, "doc_id", "text", 3, 8, 4))
    assert(lk.agg(sum(col("n_pairs"))).head.getLong(0) == pairs.count(),
      "every near-dup pair must land in exactly one source-pair bucket")
  }

  test("q195 zipf audit: natural-text spectrum invariants per source") {
    val rows = graft.queries.CurationQueries.queries("q195_zipf_audit")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // frequencies are non-increasing in rank, so the LS slope on the
      // log-log spectrum can never be positive
      assert(r.getAs[Double]("zipf_slope") <= 0.0, s"positive slope: $r")
      assert(r.getAs[Long]("n_head") >= 1L && r.getAs[Long]("n_head") <= 200L)
      val (vocab, toks) = (r.getAs[Long]("vocab"), r.getAs[Long]("n_tokens"))
      assert(vocab >= 1L && vocab <= toks, s"vocab exceeds token count: $r")
      val heaps = r.getAs[Double]("heaps_coeff")
      assert(math.abs(heaps -
        math.rint(vocab / math.sqrt(toks.toDouble) * 1e6) / 1e6) < 1e-9)
      // the most frequent word's ln-freq bounds the fitted intercept from
      // below only loosely; just pin finiteness of the published pair
      assert(!r.getAs[Double]("zipf_intercept").isNaN)
    }
  }

  test("q203 class balance: shares sum to one, entropy bounds hold") {
    val rows = graft.queries.CurationQueries
      .queries("q203_class_balance")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nClasses = rows.head.getAs[Long]("n_classes")
    assert(rows.length.toLong == nClasses, "one row per class")
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4,
      "shares must partition the corpus")
    rows.foreach { r =>
      val (ent, eff) = (r.getAs[Double]("entropy"),
        r.getAs[Double]("effective_classes"))
      assert(ent >= 0.0 && ent <= math.log(nClasses.toDouble) + 1e-9,
        s"entropy outside [0, ln k]: $r")
      // exp(H) <= k, equality iff perfectly balanced
      assert(eff >= 1.0 - 1e-9 && eff <= nClasses + 1e-6, s"effective classes: $r")
      assert(r.getAs[Double]("imbalance_ratio") >= 1.0 - 1e-9)
    }
  }

  test("q206 water filling: allocations exhaust the budget at one level") {
    val rows = graft.queries.CurationQueries
      .queries("q206_water_filling")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalSupply = rows.map(_.getAs[Long]("supply")).sum
    val budget = totalSupply * 9 / 10
    val level = rows.head.getAs[Double]("level")
    rows.foreach { r =>
      assert(r.getAs[Double]("level") == level, "level must be global")
      val (sup, alloc) = (r.getAs[Long]("supply"), r.getAs[Double]("alloc"))
      assert(alloc <= sup + 1e-6, s"allocated beyond supply: $r")
      if (r.getAs[Boolean]("funded")) assert(alloc == sup.toDouble)
      else assert(math.abs(alloc - level) < 1e-9,
        s"capped source not at the water level: $r")
    }
    // B < total ⇒ at least one source capped; allocations exhaust B
    assert(rows.exists(!_.getAs[Boolean]("funded")))
    val total = rows.map(_.getAs[Double]("alloc")).sum
    assert(math.abs(total - budget.toDouble) < rows.length * 1e-5,
      s"allocations $total do not exhaust budget $budget")
  }
}
