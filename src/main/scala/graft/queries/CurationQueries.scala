package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Caching.ScopedPersist
import graft.functions.{BloomFunctions, GraftFunctions}
import graft.operators.{Dedup, TextAnalysis}

/** SURVEY.md §2.3 round-3 additions — the curation end of the
  * training-data pipeline: applying dedup to the corpus, entropy
  * quality signals, curriculum selection, exact quota sampling, and
  * Bloom-filter decontamination.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  import TextQueries.{plantedCorpus, corpusSql, wsSql}

  val queries: Map[String, Q] = Map(

    // §2.3 — dedup APPLIED: the corpus rewrite that consumes the
    // cluster table (q59) — drop every member of a duplicate group
    // except its canonical (minimum) id, keep all unclustered docs.
    // LSH → connected components → one anti-join pass over the corpus;
    // the anti-join side is only the near-dup members, which is
    // orders of magnitude smaller than the corpus at 100 TB.
    "q79_dedup_apply" -> { (s, d) =>
      val corpus = plantedCorpus(s, d)
      val bands = Dedup.lshBandsMd5Narrow(corpus, "doc_id", "text",
        shingleWidth = 3, nSeeds = 8, rowsPerBand = 4)
      val clusters = Dedup.connectedComponentsTwoPhase(Dedup.lshCandidatePairs(bands))
      val removed = clusters.filter(col("cluster_id") =!= col("doc_id"))
        .select(col("doc_id"))
      corpus.join(removed, Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },

    // §2.3 — character-entropy quality signal (compression proxy:
    // gibberish scores high, repeated boilerplate low). One narrow
    // codegen'd kernel pass (CharEntropy expression) — no explode of
    // the character stream, unlike the oracle formulation.
    "q80_entropy" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          GraftFunctions.charEntropy(col("text")).as("char_entropy"))
        .orderBy(col("doc_id"))
    },

    // §2.3 — curriculum selection: top-5 docs per language by lexical
    // diversity (distinct-word ratio from the quality-score pass),
    // deterministic tie-break on doc_id. One window per language
    // partition — the standard "best docs per stratum" mixing step.
    "q81_curriculum_topk" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val scored = docs.select(col("doc_id"), col("lang"))
        .join(TextAnalysis.qualityScore(docs, "doc_id", "text")
          .select(col("doc_id"), col("distinct_ratio")), "doc_id")
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("distinct_ratio").desc, col("doc_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("lang"), col("rank").cast("long").as("rank"),
          col("doc_id"), col("distinct_ratio"))
        .orderBy(col("lang"), col("rank"))
    },

    // §2.3 — exact quota sampling: exactly N docs per stratum, chosen
    // by deterministic content-independent hash order (md5 of a salted
    // id) — reproducible under any partitioning, no rand(), and the
    // per-stratum scan is one window over the stratum partition.
    // leakage-safe GROUPED split (GroupShuffleSplit): the split is a
    // deterministic hash of the GROUP key (source), not the doc, so
    // related / near-duplicate docs from one origin can never straddle
    // train and holdout — the grouped counterpart of q52's per-doc
    // split. One narrow pass, no shuffle: the hash is per-row algebra.
    "q105_grouped_split" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          when(substring(md5(concat(lit("q105:"), col("source"))), 1, 1)
            .isin("0", "1", "2"), lit("holdout"))
            .otherwise(lit("train")).as("split"))
        .orderBy(col("doc_id"))
    },

    // §2.3 — weighted Bernoulli sampling (round 6): keep each doc with
    // probability proportional to a quality signal (here length,
    // clamped to [0.1, 0.9]) — the importance-sampling primitive for
    // data mixing, distinct from q77's integer upsampling. The uniform
    // draw is a content-independent salted hash (first 6 md5 hex chars
    // / 16^6), so the sample is reproducible under any partitioning
    // and bit-identical in the oracle. Narrow per-row algebra.
    "q109_weighted_sample" -> { (s, d) =>
      val u = conv(substring(md5(concat(lit("q109:"),
          col("doc_id").cast("string"))), 1, 6), 16, 10)
        .cast("long").cast("double") / lit(16777216.0)
      val p = least(lit(0.9), greatest(lit(0.1),
        col("n_chars").cast("double") / lit(400.0)))
      Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"))
        .filter(u < p)
        .select(col("doc_id"), col("n_chars"), round(p, 6).as("keep_p"))
        .orderBy(col("doc_id"))
    },

    "q82_quota_sample" -> { (s, d) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(concat(lit("q82:"), col("doc_id").cast("string"))),
          col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"))
        .withColumn("pick", row_number().over(w))
        .filter(col("pick") <= 50)
        .select(col("lang"), col("pick").cast("long").as("pick"), col("doc_id"))
        .orderBy(col("lang"), col("pick"))
    },

    // §2.3 — Bloom-filter decontamination (the 100 TB shape of q70):
    // benchmark shingles fold into a 16 KiB filter (one mergeable
    // aggregate, no distinct needed — inserts are idempotent), the
    // filter broadcasts, and the corpus probes it in a narrow
    // codegen'd pass. No join, no shuffle of corpus data at all.
    // Rows-only (false positives are data-dependent); CurationSpec
    // asserts no false negatives vs the exact q70 join and a bounded
    // flagged-doc overhead.
    "q83_bloom_decontam" -> { (s, d) =>
      val planted = plantedCorpus(s, d)
      TextAnalysis.contaminationBloom(
        corpus = planted.filter(col("doc_id") >= 20),
        benchmark = planted.filter(col("doc_id") < 20),
        idCol = "doc_id", textCol = "text", n = 8,
        numBits = 1 << 17, numHashes = 5)
        .orderBy(col("doc_id"))
    },

    // §2.3 — data-mixing weight solver (round 7): the planning step
    // between measuring a corpus and sampling it (q72/q77/q109 apply
    // the rates this computes). Target = equal token share per
    // source; each source's keep rate is min(1, target/actual) —
    // over-represented sources downsample, under-represented ones
    // keep everything (integer upsampling beyond 1.0 is q77's job).
    // One partial-agg groupBy over the corpus + a 1-row broadcast;
    // the per-source table is dimension-sized at any corpus scale.
    "q116_mix_weights" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val bySrc = Tables.documents(s, d)
        .select(col("source"),
          size(GraftFunctions.normWords(col("text"))).as("tok"))
        .groupBy(col("source"))
        .agg(sum(col("tok")).cast("long").as("src_tokens"))
        .scopedPersist() // dimension-sized; feeds both the totals and the output
      val totals = bySrc
        .agg(sum(col("src_tokens")).cast("long").as("total"),
          count(lit(1)).as("n_sources"))
      val rate = least(lit(1.0),
        (col("total").cast("double") / col("n_sources")) / col("src_tokens"))
      bySrc.crossJoin(broadcast(totals))
        .select(col("source"), col("src_tokens"),
          round(rate, 6).as("keep_rate"),
          round(col("src_tokens") * rate, 6).as("expected_tokens"))
        .orderBy(col("source"))
    },

    // §2.3 — DSIR-style data selection (round 7 — Xie et al. 2023,
    // arXiv:2302.03169): rank corpus docs by how target-like they
    // are. Features = words hashed (md5) into 512 buckets; two
    // add-one smoothed bucket LMs — TARGET (here: the English slice)
    // and RAW (whole corpus); per-doc importance = Σ over its tokens
    // of ln p_T(b) − ln p_R(b). Both LMs are 512-row tables built by
    // one partial-agg groupBy each and BROADCAST back — the corpus is
    // touched by two narrow passes and one per-doc aggregate, nothing
    // else, at any scale. Per-bucket deltas are DECIMAL(18,12)-
    // quantized so the per-doc sum is exact and order-independent;
    // selection = top-200 by (rounded ratio desc, doc_id), a
    // TakeOrderedAndProject — never a global window.
    "q118_dsir_select" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val nBuckets = 512
      val words = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(GraftFunctions.normWords(col("text"))).as("word"))
        .select(col("doc_id"), col("lang"),
          (GraftFunctions.md5HexLong(col("word"), 1, 8)
            % nBuckets).as("bkt"))
        .scopedPersist() // feeds both LMs + the scoring join
      val cR = words.groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
      val cT = words.filter(col("lang") === "en")
        .groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
      val nR = words.agg(count(lit(1)).as("nr"))
      val nT = words.filter(col("lang") === "en").agg(count(lit(1)).as("nt"))
      val delta = cR.join(cT, Seq("bkt"), "left")
        .na.fill(0L, Seq("ct"))
        .crossJoin(broadcast(nR)).crossJoin(broadcast(nT))
        .select(col("bkt"),
          (log((col("ct") + lit(1)).cast("double") / (col("nt") + lit(nBuckets)))
            - log((col("cr") + lit(1)).cast("double") / (col("nr") + lit(nBuckets))))
            .cast(org.apache.spark.sql.types.DecimalType(18, 12)).as("delta"))
      words.join(broadcast(delta), "bkt")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feats"),
          round(sum(col("delta")).cast("double"), 6).as("log_ratio"))
        .orderBy(col("log_ratio").desc, col("doc_id"))
        .limit(200)
        .orderBy(col("doc_id"))
    },

    // §2.3 — cross-source overlap audit (round 7): pairwise 3-gram
    // shingle Jaccard between SOURCES — which corpus slices share
    // content (provenance / licensing / cross-contamination before
    // mixing). Per-source DISTINCT shingle sets, one uniform-key
    // self-join: each shingle's fan-out is bounded by C(#sources, 2)
    // regardless of corpus size, so the pair matrix costs one distinct
    // + one join at 100 TB; the 190-row pair frame is dimension-sized.
    "q124_source_overlap" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val sh = Tables.documents(s, d)
        .select(col("source"), GraftFunctions.normWords(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .scopedPersist() // bind ws before the shingle lambda
        .select(col("source"), explode(expr(
          "transform(sequence(0, size(ws)-3), " +
            "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")).as("sh"))
        .distinct()
        .scopedPersist() // three consumers: counts + both join sides
      val cnt = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
      val inter = sh.as("a")
        .join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("n_inter"))
      val pairs = cnt.select(col("source").as("s1"), col("n_sh").as("n_a"))
        .join(cnt.select(col("source").as("s2"), col("n_sh").as("n_b")),
          col("s1") < col("s2"))
      pairs.join(inter, Seq("s1", "s2"), "left")
        .na.fill(0L, Seq("n_inter"))
        .select(col("s1"), col("s2"), col("n_inter"), col("n_a"), col("n_b"),
          round(col("n_inter").cast("double")
            / (col("n_a") + col("n_b") - col("n_inter")), 6).as("jaccard"))
        .orderBy(col("s1"), col("s2"))
    },

    // §2.3 — nearest-centroid topic assignment (the k-means/IVF
    // ASSIGNMENT step as a standalone curation op — domain labeling /
    // cluster-balanced mixing input). Centroids are a fixed tiny
    // dimension (here the first 8 vectors; a trained model ships its
    // k×64 floats identically) broadcast into a narrow per-vector
    // argmax: cross join against k rows stays map-side, and the
    // per-vector max collapses in the partial aggregate BEFORE the
    // one uniform-key shuffle — no global window, no k-way fan-out
    // ever leaves the map stage. Ties on the round-6 render-stable
    // cosine break to the smallest topic id (max of (sim, -topic)).
    "q125_topic_assign" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("topic_id"), col("embedding").as("centroid"))
      emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("topic_id"),
          round(GraftFunctions.cosine(col("embedding"), col("centroid")), 6)
            .cast("decimal(10,6)").as("sim"))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("sim"), (-col("topic_id")).as("nt"))).as("m"))
        .select(col("vec_id"), (-col("m.nt")).as("topic_id"),
          col("m.sim").cast("double").as("cos_sim"))
        .orderBy(col("vec_id"))
    },

    // §2.3 — tokenizer-vocabulary coverage / OOV-rate audit: fraction
    // of corpus tokens covered by the top-512 corpus vocabulary, per
    // source (the "will the tokenizer fragment this slice?" gate
    // before a mix ships). Vocab build is one uniform-word partial
    // agg + TakeOrdered (total order, word tie-break — never a global
    // sort); the probe is a BROADCAST join of the 512-row vocab into
    // a second narrow pass — at 100 TB the corpus is read twice and
    // shuffled only by the bounded word domain, never by doc.
    "q126_vocab_coverage" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val words = Tables.documents(s, d)
        .select(col("source"),
          explode(GraftFunctions.normWords(col("text"))).as("w"))
        .scopedPersist() // two consumers: vocab build + coverage probe
      val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(512)
        .select(col("w"), lit(1).as("hit"))
      words.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(coalesce(col("hit"), lit(0)).cast("long")).as("n_covered"))
        .select(col("source"), col("n_tokens"), col("n_covered"),
          round(col("n_covered").cast("double") / col("n_tokens"), 6)
            .as("coverage"))
        .orderBy(col("source"))
    },

    // §2.3 — winsorized robust stats per source (outlier-insensitive
    // length profile: clip at the exact p10/p90 disc quantiles, then
    // mean). The quantile pass collapses the corpus to (source, value)
    // COUNTS first — the rank window then runs over the bounded value
    // domain (≤ distinct lengths per source), never over rows, which
    // is the 100 TB-correct shape for exact grouped quantiles; rank
    // thresholds ceil(q·n) are INTEGER arithmetic ((n+9) div 10), so
    // no float boundary can disagree with the oracle. The clip+mean
    // is one more corpus pass with the tiny bounds table broadcast.
    "q127_winsorized_stats" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val docs = Tables.documents(s, d).select(col("source"), col("n_chars"))
      val vc = docs.groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("cnt"))
        .scopedPersist() // consumers: cumulative ranks + per-source totals
      val cum = vc.withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(col("source")).orderBy(col("n_chars"))))
      val tot = vc.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
      val bounds = cum.join(tot, "source")
        .withColumn("lo_r", expr("(n + 9) div 10"))
        .withColumn("hi_r", expr("(n * 9 + 9) div 10"))
        .groupBy(col("source"), col("n"))
        .agg(min(when(col("cum") >= col("lo_r"), col("n_chars"))).as("lo"),
          min(when(col("cum") >= col("hi_r"), col("n_chars"))).as("hi"))
      docs.join(broadcast(bounds), "source")
        .groupBy(col("source"), col("n"), col("lo"), col("hi"))
        .agg(sum(least(greatest(col("n_chars"), col("lo")), col("hi"))).as("s"))
        .select(col("source"), col("n"), col("lo"), col("hi"),
          round(col("s").cast("double") / col("n"), 6).as("win_mean"))
        .orderBy(col("source"))
    },

    // §2.3 — quality-based canonical selection for duplicate clusters:
    // the q59/q79 resolution step upgraded from "keep the min id" to
    // "keep the BEST member" (highest distinct-word ratio, tie → min
    // id) — the curation decision production pipelines actually make.
    // Per-cluster argmax is the same partial-agg max-of-struct shape
    // as q125 (quality on the render-stable DECIMAL grid, negated id
    // as tie-break); the canonical table is cluster-count-sized ≪
    // corpus, so the member join AQE-broadcasts at any scale.
    "q128_cluster_canonical" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val corpus = plantedCorpus(s, d)
      val bands = Dedup.lshBandsMd5Narrow(corpus, "doc_id", "text",
        shingleWidth = 3, nSeeds = 8, rowsPerBand = 4)
      val member = Dedup.connectedComponentsTwoPhase(Dedup.lshCandidatePairs(bands))
        .join(TextAnalysis.qualityScore(corpus, "doc_id", "text")
          .select(col("doc_id"), col("distinct_ratio")), "doc_id")
        .scopedPersist() // consumers: canonical argmax + member emit
      val canon = member.groupBy(col("cluster_id"))
        .agg(max(struct(col("distinct_ratio").cast("decimal(10,6)").as("q"),
          (-col("doc_id")).as("nd"))).as("m"))
        .select(col("cluster_id"), (-col("m.nd")).as("canonical_id"))
      member.join(canon, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
          (col("doc_id") === col("canonical_id")).as("is_canonical"))
        .orderBy(col("doc_id"))
    },

    // §2.3 — cross-source duplication LEAKAGE audit: q124 asks "how
    // much raw shingle vocabulary do two sources share?"; this asks
    // the sharper provenance question — how many NEAR-DUP DOC PAIRS
    // straddle two sources (license contamination / double-counting
    // before a mix ships). The LSH pair set is orders of magnitude
    // smaller than the corpus, so attaching sources is two joins in
    // which the PAIR side broadcasts — the corpus never shuffles;
    // source pairs are emitted unordered (least/greatest) so A→B and
    // B→A collapse.
    // §2.3 — per-SOURCE quality scorecard (round 7): the triage
    // report a curation run ships per provenance — doc counts,
    // corpus-wide exact-dup rate, quality keep rate, mean size — the
    // table that decides which sources stay in the next mix. One md5
    // hash shuffle (q30's key), one doc_id join, one source-sized
    // aggregate; every per-doc signal is the existing codegen'd
    // machinery.
    "q143_source_scorecard" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val hashed = docs.select(col("doc_id"), col("source"),
        md5(concat_ws(" ", GraftFunctions.normWords(col("text")))).as("h"))
      val dupped = hashed
        .join(hashed.groupBy(col("h")).agg(count(lit(1)).as("nh")), "h")
        .select(col("doc_id"), col("source"), (col("nh") > 1).as("is_dup"))
      val quality = TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"), col("n_chars"), col("n_words"))
      dupped.join(quality, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_dup").cast("long")).as("n_dup"),
          sum(col("keep").cast("long")).as("n_keep"),
          sum(col("n_chars").cast("long")).as("sum_chars"),
          sum(col("n_words").cast("long")).as("sum_words"))
        .select(col("source"), col("n_docs"), col("n_dup"),
          round(col("n_dup").cast("double") / col("n_docs"), 6).as("dup_rate"),
          col("n_keep"),
          round(col("n_keep").cast("double") / col("n_docs"), 6).as("keep_rate"),
          round(col("sum_chars").cast("double") / col("n_docs"), 6).as("mean_chars"),
          round(col("sum_words").cast("double") / col("n_docs"), 6).as("mean_words"))
        .orderBy(col("source"))
    },

    "q130_dup_leakage" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val bands = Dedup.lshBandsMd5Narrow(docs, "doc_id", "text",
        shingleWidth = 3, nSeeds = 8, rowsPerBand = 4)
      val pairs = Dedup.lshCandidatePairs(bands)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.toDF("doc_a", "src_a"), "doc_a")
        .join(src.toDF("doc_b", "src_b"), "doc_b")
        .select(least(col("src_a"), col("src_b")).as("s1"),
          greatest(col("src_a"), col("src_b")).as("s2"))
        .groupBy(col("s1"), col("s2"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("cross_source", col("s1") =!= col("s2"))
        .orderBy(col("s1"), col("s2"))
    },

    // §2.3 — the COMPOSED modern curation chain in one declarative
    // plan (the full Dolma/C4-class pass, end to end): NFC normalize
    // → model-free quality gate → exact dedup (keep-first among
    // survivors) → benchmark decontamination (8-shingles vs the
    // doc_id<20 eval set) → token-budget selection (distributed
    // prefix sum). Emits a per-doc VERDICT TRACE — which stage
    // dropped each doc — the auditable artifact a curation run ships.
    // Every stage is the existing scale machinery; the chain is one
    // lazily-planned DAG Catalyst optimizes whole.
    "q136_curation_chain" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val normed = Tables.documents(s, d)
        .select(col("doc_id"), GraftFunctions.nfc(col("text")).as("text"))
        .scopedPersist() // consumers: benchmark shingles + corpus stages
      val corpus = normed.filter(col("doc_id") >= 20)
      val q = TextAnalysis.qualityScore(corpus, "doc_id", "text")
        .select(col("doc_id"), col("keep"), col("distinct_ratio"),
          col("n_words").cast("long").as("ws_tokens"))
        .scopedPersist() // consumers: survivor chain + verdict join
      val s1 = q.filter(col("keep") === 1)
        .select(col("doc_id"), col("distinct_ratio"), col("ws_tokens"))
      val hashes = corpus.join(s1.select("doc_id"), "doc_id")
        .select(col("doc_id"), GraftFunctions.normWords(col("text")).as("ws"))
        .select(col("doc_id"), md5(array_join(col("ws"), " ")).as("th"))
        .scopedPersist() // consumers: min-per-hash + membership
      val dup = hashes
        .join(hashes.groupBy(col("th")).agg(min(col("doc_id")).as("keep_id")), "th")
        .filter(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id"), lit(1).as("isdup"))
        .scopedPersist() // consumers: anti-join + verdict join
      val contam = TextAnalysis.contamination(corpus,
          normed.filter(col("doc_id") < 20), "doc_id", "text", n = 8)
        .select(col("doc_id"), lit(1).as("iscont"))
        .scopedPersist() // consumers: anti-join + verdict join
      val s3 = s1
        .join(dup.select("doc_id"), Seq("doc_id"), "left_anti")
        .join(contam.select("doc_id"), Seq("doc_id"), "left_anti")
      val kept = graft.operators.Selection.budgetSelect(s3,
          Seq(col("distinct_ratio").desc, col("doc_id").asc),
          col("ws_tokens"), budget = 15000L)
        .select(col("doc_id"), col("cum_weight").as("cum_tokens"))
      normed.select(col("doc_id"))
        .join(q.select(col("doc_id"), col("keep"), col("ws_tokens")),
          Seq("doc_id"), "left")
        .join(dup, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") < 20, "benchmark")
            .when(col("keep") === 0, "quality")
            .when(col("isdup") === 1, "dup")
            .when(col("iscont") === 1, "contam")
            .when(col("cum_tokens").isNotNull, "kept")
            .otherwise("budget").as("verdict"),
          col("ws_tokens"), col("cum_tokens"))
        .orderBy(col("doc_id"))
    },

    // §2.3 (round 8) — DENSITY-BASED data pruning: embedding-space
    // neighbor count at cosine ≥ 0.2, then a deterministic inverse-
    // density subsample that thins dense (redundant) regions and
    // keeps every sparse-region point — the data-pruning selection
    // rule. Exact all-pairs density is the oracled baseline;
    // densityPruneLsh is the 100 TB path (one-sided undercounts ⇒
    // never prunes what the exact rule keeps; spec-asserted).
    "q148_density_prune" -> { (s, d) =>
      graft.operators.Similarity.densityPruneExact(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        tau = 0.2, floor = 5)
        .orderBy(col("vec_id"))
    },

    // §2.3 (round 8) — per-source WEIGHTED reservoir sampling (k docs
    // per source, P ∝ doc length) on the native TopKPerKeyExec.
    // Classical A-Res keys (u^(1/w)) are transcendental — a 1-ulp pow
    // divergence between engines could flip an ordering — so the
    // weight enters as an integer TICKET RACE instead: every char
    // buys one 48-bit md5 ticket, a doc's priority is its BEST
    // (minimum) ticket, and min-of-w-uniforms is exactly the
    // discretized exponential race (P(win) = w/Σw, successive ranks =
    // draws without replacement). All integer arithmetic — zero
    // float knife-edges — and the same md5 primitive the sampling
    // family already uses. The ticket derivation is narrow
    // (transform+array_min per row); TopKPerKeyExec then shuffles
    // only k-bounded partials per source, never the corpus.
    "q150_reservoir_sample" -> { (s, d) =>
      import graft.Caching.FanOut
      // round 17: the ticket is n_chars md5 draws PER DOC (~10⁶ digests
      // at bench scale) — ride the fused Md5HexLong kernel (same value,
      // no hex render/parse) and fan the scan out iff under-parallel
      // (top-k per key is partition-invariant; no-op at real scale)
      val ticket = array_min(transform(
        sequence(lit(1), col("n_chars")),
        j => GraftFunctions.md5HexLong(concat(lit("q150:"),
          col("doc_id").cast("string"), lit(":"), j.cast("string")), 1, 12)))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .fanOutSmallScan()
        .withColumn("neg_ticket", -ticket)
      graft.plans.TopKPlan.topKPerKey(docs, Seq("source"),
          scoreCol = "neg_ticket", tieCol = "doc_id", k = 20)
        .select(col("source"), col("doc_id"), col("n_chars"), col("rnk"))
        .orderBy(col("source"), col("rnk"))
    },

    // §2.3 (round 8) — TEMPERATURE-scaled source mixing (the mT5 /
    // multilingual-LM rebalance): target share q_s ∝ tokens_s^α with
    // α = 0.5 flattens the source distribution toward uniform without
    // inverting it; keep_rate caps at 1 (a source can't upsample
    // here — q77 covers replication). Dimension-sized algebra: one
    // per-source partial agg, a 1-row total broadcast; pow appears
    // only inside round(,6) VALUE columns, never in a filter or
    // ordering, so no cross-engine float knife-edge exists.
    "q151_temperature_mix" -> { (s, d) =>
      val perSrc = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).cast("long").as("src_chars"))
      val tot = perSrc.agg(
        sum(col("src_chars")).cast("long").as("total_chars"),
        sum(sqrt(col("src_chars"))).as("z"))
      val budget = col("total_chars").cast("double") / 2
      perSrc.crossJoin(broadcast(tot))
        .select(col("source"), col("src_chars"),
          round(col("src_chars").cast("double") / col("total_chars"), 6)
            .as("share_raw"),
          round(sqrt(col("src_chars")) / col("z"), 6).as("share_temp"),
          round(least(lit(1.0),
            budget * (sqrt(col("src_chars")) / col("z"))
              / col("src_chars")), 6).as("keep_rate"),
          round(col("src_chars") * least(lit(1.0),
            budget * (sqrt(col("src_chars")) / col("z"))
              / col("src_chars")), 6).as("expected_chars"))
        .orderBy(col("source"))
    },

    // §2.3 (round 9) — multi-EPOCH data-schedule planner: q151's
    // temperature shares under an OVER-subscribed budget (2× the
    // corpus) — the planning table that answers "how many passes over
    // each source does this mixture imply, and which sources hit the
    // repeated-data cap" (Muennighoff'23: ~4 epochs before repeated
    // tokens stop helping). Pure arithmetic over the tiny per-source
    // table; one groupBy + a broadcast 1-row total. Verdicts compare
    // the IDENTICAL double expression on both engines, so no rounding
    // boundary can flip them.
    "q176_epoch_schedule" -> { (s, d) =>
      val perSrc = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(col("n_chars")).cast("long").as("src_chars"))
      val tot = perSrc.agg(
        sum(col("src_chars")).cast("long").as("total_chars"),
        sum(sqrt(col("src_chars"))).as("z"))
      val alloc = lit(2.0) * col("total_chars") *
        (sqrt(col("src_chars")) / col("z"))
      val epochsRaw = alloc / col("src_chars")
      perSrc.crossJoin(broadcast(tot))
        .select(col("source"), col("src_chars"),
          round(sqrt(col("src_chars")) / col("z"), 6).as("share_temp"),
          round(alloc, 6).as("alloc_chars"),
          round(epochsRaw, 6).as("epochs_raw"),
          round(least(lit(4.0), epochsRaw), 6).as("epochs"),
          when(epochsRaw > 4.0, "repeat_capped")
            .when(epochsRaw > 1.0, "repeat")
            .otherwise("fresh").as("verdict"))
        .orderBy(col("source"))
    },

    // §2.3 (round 9) — per-source length CONCENTRATION (Gini): does
    // one giant document dominate a source's character mass? High
    // Gini means the source's mixing weight is really a bet on a few
    // docs — the inequality audit run before trusting per-source
    // token counts. Ranks come from the GROUPED distributed prefix
    // sum over the (n_chars, doc_id) total order (never a per-source
    // global window); the Gini numerators are exact integer sums,
    // divided once under round(,6) with the identical expression on
    // both engines.
    "q186_length_gini" -> { (s, d) =>
      import graft.operators.Selection
      val ranked = Selection.groupedPrefixSum(
        Tables.documents(s, d).select(col("source"), col("doc_id"), col("n_chars")),
        Seq(col("source")), Seq(col("n_chars"), col("doc_id")), lit(1L))
      ranked
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          sum(col("cum_weight") * col("n_chars")).cast("long").as("srx"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          round((lit(2.0) * col("srx")) / (col("n_docs") * col("total_chars"))
            - (col("n_docs") + 1) / col("n_docs"), 6).as("gini"))
        .orderBy(col("source"))
    },

    // §2.3 (round 11) — ZIPF-SLOPE corpus-statistics audit: a natural
    // text corpus follows Zipf's law (log-frequency ≈ slope·log-rank,
    // slope ≈ −1); synthetic, template, or mode-collapsed sources show
    // a flatter or steeper spectrum, so the per-source slope is a
    // cheap generator-artifact detector. Pipeline: one word explode +
    // groupBy, a PARTITIONED rank window per source, then closed-form
    // least squares on (ln rank, ln freq) over the top-200 spectrum —
    // log sums are ~200 bounded terms so double aggregation is
    // round(.,6)-stable across engines. vocab/n_tokens come from the
    // full distribution, not the top-200 head.
    "q195_zipf_audit" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val freq = Tables.documents(s, d)
        .select(col("source"),
          explode(GraftFunctions.normWords(col("text"))).as("word"))
        .groupBy(col("source"), col("word"))
        .agg(count(lit(1)).as("freq"))
        .scopedPersist() // consumers: totals agg + ranked head
      val totals = freq.groupBy(col("source"))
        .agg(sum(col("freq")).cast("long").as("n_tokens"),
          count(lit(1)).as("vocab"))
      val head = freq
        .withColumn("rnk", row_number().over(Window.partitionBy(col("source"))
          .orderBy(col("freq").desc, col("word"))))
        .filter(col("rnk") <= 200)
        .select(col("source"), log(col("rnk").cast("double")).as("x"),
          log(col("freq").cast("double")).as("y"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
      head.join(totals, "source")
        .select(col("source"), col("n_tokens"), col("vocab"),
          col("n").cast("long").as("n_head"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6)
            .as("zipf_slope"),
          round((col("sy") - ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
            col("n"), 6).as("zipf_intercept"),
          round(col("vocab") / sqrt(col("n_tokens").cast("double")), 6)
            .as("heaps_coeff"))
        .orderBy(col("source"))
    },

    // §2.3 (round 11) — CLASS-BALANCE audit before classifier
    // training (q115/q166 consume these labels): per-label counts and
    // shares plus the corpus-level imbalance diagnostics — max/min
    // ratio, Shannon entropy of the label distribution, and the
    // effective class count exp(H) (the "how many classes am I really
    // training on" number that decides whether q109/q77 reweighting
    // is needed). One label-sized groupBy; every corpus scalar rides
    // a broadcast 1-row frame.
    "q203_class_balance" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val lab = Tables.embeddings(s, d).groupBy(col("label"))
        .agg(count(lit(1)).as("n"))
        .scopedPersist() // consumers: totals + entropy + final rows
      val tot = lab.agg(sum(col("n")).cast("long").as("total"),
        count(lit(1)).as("n_classes"),
        max(col("n")).as("n_max"), min(col("n")).as("n_min"))
      val ent = lab.crossJoin(broadcast(tot.select(col("total"))))
        .select((-(col("n") / col("total")) *
          log(col("n") / col("total"))).as("term"))
        .agg(sum(col("term")).as("ent"))
      lab.crossJoin(broadcast(tot)).crossJoin(broadcast(ent))
        .select(col("label"), col("n"),
          round(col("n") / col("total"), 6).as("share"),
          col("n_classes"),
          round(col("n_max").cast("double") / col("n_min"), 6)
            .as("imbalance_ratio"),
          round(col("ent"), 6).as("entropy"),
          round(exp(col("ent")), 6).as("effective_classes"))
        .orderBy(col("label"))
    },

    // §2.3 (round 11) — WATER-FILLING token-budget allocation across
    // sources: given a corpus budget (90% of total chars — scale-free
    // by construction), every source is funded up to the common water
    // level c where Σ min(supply, c) = B; small sources keep their
    // full supply, large sources cap at c. The closed form needs one
    // ascending prefix-sum pass: source k is fully funded iff
    // supply_k ≤ (B − P_{k−1})/(n−k+1), and c = (B − P_funded)/
    // n_capped. The window runs over the SOURCE table (≤ #sources
    // rows — bounded by contract, the q187 key-table class), never
    // the corpus; every scalar rides a broadcast 1-row frame. This is
    // the principled version of q151's temperature mixing when the
    // constraint is a hard budget.
    "q206_water_filling" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val sup = Tables.documents(s, d).groupBy(col("source"))
        .agg(sum(col("n_chars")).cast("long").as("sup"))
        .scopedPersist() // consumers: totals + ranked pass
      val tot = sup.agg(sum(col("sup")).cast("long").as("total"),
        count(lit(1)).as("n"))
      val w = Window.orderBy(col("sup"), col("source"))
      val ranked = sup.crossJoin(broadcast(tot))
        .withColumn("k", row_number().over(w).cast("long"))
        .withColumn("pprev", coalesce(sum(col("sup")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("budget", expr("(total * 9) div 10"))
        .withColumn("funded", col("sup") <=
          (col("budget") - col("pprev")).cast("double") /
            (col("n") - col("k") + 1))
        .scopedPersist() // consumers: level agg + final rows
      val lvl = ranked.agg(
        sum(when(col("funded"), col("sup")).otherwise(0L)).cast("long")
          .as("p_funded"),
        sum(when(col("funded"), 1L).otherwise(0L)).cast("long").as("n_funded"))
      ranked.crossJoin(broadcast(lvl))
        .select(col("source"), col("sup").as("supply"), col("funded"),
          round((col("budget") - col("p_funded")).cast("double") /
            (col("n") - col("n_funded")), 6).as("level"),
          round(when(col("funded"), col("sup").cast("double"))
            .otherwise((col("budget") - col("p_funded")).cast("double") /
              (col("n") - col("n_funded"))), 6).as("alloc"))
        .orderBy(col("source"))
    },

    // §2.3 (round 13) — K-ANONYMITY suppression audit (Sweeney '02):
    // before releasing a curated corpus with per-document metadata,
    // every quasi-identifier combination (source, lang, length bucket)
    // that matches fewer than k documents is re-identifiable and must
    // be suppressed. Reports, per source: group/row suppression counts
    // and the k actually achieved by the kept rows (min kept group
    // size). Scale shape: two partial-agg groupBys — the QI-group
    // frame is |distinct QI| rows regardless of corpus size, and no
    // text ever shuffles; this is the same two-level rollup discipline
    // as q143's scorecard.
    "q220_k_anonymity" -> { (s, d) =>
      val k = 5L
      val g = Tables.documents(s, d)
        .select(col("source"), col("lang"),
          floor(col("n_chars") / 100).cast("long").as("len_bkt"))
        .groupBy(col("source"), col("lang"), col("len_bkt"))
        .agg(count(lit(1)).as("g"))
      g.groupBy(col("source"))
        .agg(sum(col("g")).cast("long").as("n_rows"),
          count(lit(1)).as("n_groups"),
          sum(when(col("g") < k, 1L).otherwise(0L)).cast("long")
            .as("groups_suppressed"),
          sum(when(col("g") < k, col("g")).otherwise(0L)).cast("long")
            .as("rows_suppressed"),
          sum(when(col("g") >= k, col("g")).otherwise(0L)).cast("long")
            .as("rows_kept"),
          coalesce(min(when(col("g") >= k, col("g"))), lit(0L))
            .cast("long").as("k_achieved"))
        .orderBy(col("source"))
    },

    // §2.3 (round 13) — L-DIVERSITY audit (Machanavalli et al.'07,
    // the attribute-disclosure complement to q220's k-anonymity):
    // a QI group can be k-anonymous yet leak the SENSITIVE attribute
    // outright if every member shares it — diversity requires each
    // (source, length-bucket) quasi-identifier group to contain ≥ l
    // distinct sensitive values (lang plays the sensitive role
    // here). Per source: groups, l-violating groups, rows at
    // attribute-disclosure risk, and the minimum diversity any group
    // achieves. Same shape as q220: two partial-agg groupBys, the
    // QI frame |distinct QI| rows regardless of corpus size, with a
    // countDistinct expand on the sensitive column as the only
    // addition.
    "q239_l_diversity" -> { (s, d) =>
      val l = 3L
      val g = Tables.documents(s, d)
        .select(col("source"),
          floor(col("n_chars") / 100).cast("long").as("len_bkt"),
          col("lang"))
        .groupBy(col("source"), col("len_bkt"))
        .agg(count(lit(1)).as("g"), countDistinct(col("lang")).as("ndiv"))
      g.groupBy(col("source"))
        .agg(sum(col("g")).cast("long").as("n_rows"),
          count(lit(1)).as("n_groups"),
          sum(when(col("ndiv") < l, 1L).otherwise(0L)).cast("long")
            .as("groups_violating"),
          sum(when(col("ndiv") < l, col("g")).otherwise(0L)).cast("long")
            .as("rows_at_risk"),
          min(col("ndiv")).cast("long").as("min_diversity"))
        .orderBy(col("source"))
    },

    // §2.3 (round 13) — RANDOMIZED-RESPONSE release (Warner '65, the
    // local-DP mechanism behind RAPPOR): each event reports its true
    // category with p = 3/4, otherwise one of the m−1 others chosen
    // uniformly by a deterministic md5 coin — and the release
    // publishes BOTH the noisy counts and the unbiased estimator
    // n̂_j = (obs_j − n(1−p)/(m−1)) / (p − (1−p)/(m−1)), which for
    // p=3/4 is exact rational arithmetic until ONE final IEEE
    // division. True counts ride along so the audit shows the
    // noise/debias round trip. Scale shape: the mechanism is a
    // narrow per-row map (category index via a broadcast m-row dim),
    // then two partial-agg groupBys on the category — nothing about
    // it changes at 100 TB; the md5 coin is the engine's standard
    // derandomization (q150/q109 discipline).
    "q222_rr_privacy" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d).select(col("event_id"), col("event_type"))
      val types = ev.select(col("event_type")).distinct()
        .withColumn("idx",
          row_number().over(Window.orderBy(col("event_type"))).cast("long")
            - 1L) // bounded domain: |event_type| rows (metadata-sized)
      val m = types.agg(count(lit(1)).as("m"))
      val coin = conv(substring(md5(concat(lit("q222:"),
        col("event_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 16
      val reported = ev
        .join(broadcast(types), "event_type")
        .crossJoin(broadcast(m))
        .select(col("event_type"),
          when(coin < 4,
            pmod(col("idx") + 1L + (coin % (col("m") - 1L)), col("m")))
            .otherwise(col("idx")).as("rep_idx"))
      val obs = reported
        .join(broadcast(types.select(col("idx").as("rep_idx"),
          col("event_type").as("rep_type"))), "rep_idx")
        .groupBy(col("rep_type")).agg(count(lit(1)).as("reported_count"))
        .select(col("rep_type").as("event_type"), col("reported_count"))
      val truth = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("true_count"))
      val tot = ev.agg(count(lit(1)).as("n"))
      // n̂ = (obs − n(1−p)/(m−1)) / (p − (1−p)/(m−1)) with p = 3/4
      //   = (4(m−1)·obs − n) / (3m − 4): exact integers, ONE division.
      truth.join(obs, Seq("event_type")).crossJoin(broadcast(tot))
        .crossJoin(broadcast(m))
        .select(col("event_type"), col("true_count"), col("reported_count"),
          round((lit(4.0) * (col("m") - 1L) * col("reported_count") -
            col("n")) / (col("m") * 3L - 4L), 6).as("debiased_est"))
        .orderBy(col("event_type"))
    },

    // §2.3 (round 15) — DIFFERENTIALLY-PRIVATE aggregate release,
    // rounding out the privacy family (k-anon q220, randomized
    // response q222, l-diversity q239, pseudonymization q121): the
    // central-DP histogram publish. Per-source document counts get
    // DISCRETE-LAPLACE noise via the standard difference-of-two-
    // geometrics construction (Z = G₁ − G₂, Gᵢ = ⌊−ln(uᵢ)/ε⌋ —
    // Inusah & Kozubowski '06; the sampler in Google's DP library),
    // which for sensitivity-1 counts is ε-DP with α = e^(−ε). The
    // uniforms are SEEDED-HASH (md5 of the group key + salt → 48-bit
    // mantissa), making the mechanism deterministic and therefore
    // hash-oracle-able: DuckDB computes the identical md5 → the
    // identical IEEE ln/divide/floor chain → the identical noise.
    // (A production release would swap the seeded hash for a CSPRNG
    // draw; the mechanism, ledger and plan shape are unchanged.)
    // The release carries an ε-LEDGER row: disjoint groups compose in
    // PARALLEL, so the release's total spend is ε = 0.5, not k·ε —
    // the ledger states mechanism, ε, and the group count it covers.
    // Scale shape: one partial-agg groupBy on the group key; noise is
    // per-GROUP (not per-row) arithmetic in the projection; the
    // ledger is a literal 1-row union. True counts are never emitted.
    "q264_dp_release" -> { (s, d) =>
      val eps = 0.5
      def u(salt: String) =
        (conv(substring(md5(concat(lit(s"q264:$salt:"), col("source"))),
          1, 12), 16, 10).cast("long") + 1L).cast("double") /
          lit(281474976710656L).cast("double") // 2^48, exact in double
      def geom(salt: String) =
        floor(-log(u(salt)) / lit(eps)).cast("long")
      val noisy = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("c"))
        .select(col("source").as("grp"),
          (col("c") + geom("a") - geom("b")).as("noisy_count"),
          lit(null).cast("double").as("epsilon"),
          lit(null).cast("string").as("mechanism"))
      val k = noisy.agg(count(lit(1)).as("k"))
      val ledger = k.select(lit("__ledger__").as("grp"),
        col("k").as("noisy_count"), // group count is public metadata
        lit(eps).as("epsilon"),
        lit("discrete_laplace(parallel-composition)").as("mechanism"))
      noisy.unionByName(ledger).orderBy(col("grp"))
    },

    // §2.3 (round 15) — MOORE-LEWIS cross-entropy data selection
    // (Moore & Lewis 2010, the classic in-domain selection recipe;
    // q118's DSIR importance weights are its hashed-feature
    // descendant): score every pool document by
    // ml_score = H_in(doc) − H_gen(doc), the per-token cross-entropy
    // difference between a unigram LM trained on the IN-DOMAIN slice
    // (lang = 'en' here) and one trained on the whole pool; docs the
    // in-domain model likes better (score < 0) are selected. Both LMs
    // are add-one smoothed over the JOINT vocabulary so OOV tokens are
    // defined under each: NLL_X(w) = −ln((c_X(w)+1)/(N_X+V)). Exact
    // integer counts; per-token NLLs quantized to DECIMAL(18,12)
    // before the per-doc sums (the q101/q114 discipline). Scale
    // shape: ONE token scan, two vocab-bounded partial-agg LM tables
    // LEFT-joined back on the uniform word key (AQE-broadcastable),
    // the (N_in, N_gen, V) totals a 1-row broadcast.
    "q265_moore_lewis" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val words = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(GraftFunctions.normWords(col("text"))).as("word"))
        .scopedPersist() // one token scan feeds both LMs + the scorer
      val genLm = words.groupBy(col("word")).agg(count(lit(1)).as("c_gen"))
      val inLm = words.filter(col("lang") === "en")
        .groupBy(col("word")).agg(count(lit(1)).as("c_in"))
      val tot = genLm.agg(sum(col("c_gen")).as("n_gen"),
        count(lit(1)).as("v"))
        .crossJoin(words.filter(col("lang") === "en")
          .agg(count(lit(1)).as("n_in")))
      val lm = genLm.join(inLm, Seq("word"), "left")
        .crossJoin(broadcast(tot))
        .select(col("word"),
          (-log((coalesce(col("c_in"), lit(0L)) + lit(1L)).cast("double")
            / (col("n_in") + col("v"))))
            .cast(DecimalType(18, 12)).as("nll_in"),
          (-log((col("c_gen") + lit(1L)).cast("double")
            / (col("n_gen") + col("v"))))
            .cast(DecimalType(18, 12)).as("nll_gen"))
      words.join(lm, "word")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          round(sum(col("nll_in")).cast("double") / count(lit(1)), 6)
            .as("ce_in"),
          round(sum(col("nll_gen")).cast("double") / count(lit(1)), 6)
            .as("ce_gen"))
        .select(col("doc_id"), col("n_words"), col("ce_in"), col("ce_gen"),
          round(col("ce_in") - col("ce_gen"), 6).as("ml_score"),
          (round(col("ce_in") - col("ce_gen"), 6) < 0.0).as("selected"))
        .orderBy(col("doc_id"))
    },

    // §2.3 (round 15) — CCNet PERPLEXITY BUCKETS (Wenzek et al.'20,
    // arXiv:1911.00359): the curation step that made "head/middle/
    // tail" a vocabulary — per LANGUAGE, rank documents by LM
    // perplexity and cut into terciles; head (lowest-ppl third) is
    // the presumptively-clean slice, tail the discard candidate.
    // Doc score = q101's corpus-trained mean unigram surprisal
    // (identical DECIMAL(18,12) discipline, hash-stable); the tercile
    // is ntile(3) over a LANG-PARTITIONED window ordered by
    // (score, doc_id) — deterministic ties, and partitioned windows
    // scale (per-language sort, never a global one).
    "q266_ccnet_buckets" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val words = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(GraftFunctions.normWords(col("text"))).as("word"))
        .scopedPersist() // reused: LM training + scoring
      val wc = words.groupBy(col("word")).agg(count(lit(1)).as("c"))
      val total = wc.agg(sum(col("c")).as("total"))
      val surp = wc.crossJoin(broadcast(total))
        .select(col("word"),
          (-log(col("c").cast("double") / col("total")))
            .cast(DecimalType(18, 12)).as("surp"))
      val scored = words.join(surp, "word")
        .groupBy(col("doc_id"), col("lang"))
        .agg(round(sum(col("surp")).cast("double") / count(lit(1)), 6)
          .as("mean_surprisal"))
      scored
        .withColumn("t", ntile(3).over(Window.partitionBy(col("lang"))
          .orderBy(col("mean_surprisal"), col("doc_id"))))
        .select(col("doc_id"), col("lang"), col("mean_surprisal"),
          when(col("t") === 1, lit("head"))
            .when(col("t") === 2, lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
        .orderBy(col("doc_id"))
    },

    // §2.3 (round 13) — DoReMi-STYLE domain reweighting step (Xie et
    // al.'23, arXiv:2305.10429): the mixing weights q116 SOLVES for a
    // target and q151 tempers are, in the DoReMi recipe, LEARNED from
    // per-domain EXCESS LOSS via multiplicative weights — domains the
    // proxy model finds hardest (above-reference loss) get upweighted.
    // One published step, fully deterministic: loss_i = per-source
    // mean unigram surprisal under the corpus LM (q101's discipline —
    // ln quantized to DECIMAL(18,12) per DISTINCT word, exact decimal
    // Σ(count·surprisal), ONE division); reference = the corpus-wide
    // mean; excess_i = max(0, loss_i − ref); update u_i =
    // exp(η·excess_i) quantized to DECIMAL(18,6) before the exact
    // normalizing sum; final w_i = (1−ε)·u_i/Σu + ε/m (ε-uniform
    // smoothing, the paper's trick against weight collapse). Scale
    // shape: ONE token scan + vocab-sized surprisal table joined back
    // on the uniform word key + domain-bounded (m-row) weight frames.
    "q234_doremi_step" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      import org.apache.spark.sql.types.DecimalType
      val eta = 0.1
      val eps = 0.01
      val words = Tables.documents(s, d)
        .select(col("source"),
          explode(GraftFunctions.normWords(col("text"))).as("w"))
        .scopedPersist() // consumers: vocab counts + per-source join
      val tot = words.agg(count(lit(1)).as("ntot"))
      val surp = words.groupBy(col("w")).agg(count(lit(1)).as("cw"))
        .crossJoin(broadcast(tot))
        .select(col("w"),
          (-log(col("cw").cast("double") / col("ntot")))
            .cast(DecimalType(18, 12)).as("surp"))
      val perSrc = words.join(surp, "w")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("surp")).as("ssum"))
        .select(col("source"), col("n_tokens"),
          round(col("ssum").cast("double") / col("n_tokens"), 6).as("loss"),
          col("ssum"))
      val ref = perSrc.agg(
        round(sum(col("ssum")).cast("double") / sum(col("n_tokens")), 6)
          .as("ref_loss"),
        count(lit(1)).as("m"))
      val upd = perSrc.crossJoin(broadcast(ref)) // m-row domain frame
        .select(col("source"), col("n_tokens"), col("loss"), col("ref_loss"),
          col("m"),
          round(greatest(lit(0.0), col("loss") - col("ref_loss")), 6)
            .as("excess"))
        .withColumn("u",
          round(exp(lit(eta) * col("excess")), 6).cast(DecimalType(18, 6)))
      val norm = upd.agg(sum(col("u")).as("usum"))
      upd.crossJoin(broadcast(norm))
        .select(col("source"), col("n_tokens"), col("loss"),
          col("ref_loss"), col("excess"),
          // 0.99 as a LITERAL in both engines — computing 1.0 − 0.01
          // lands one ulp away from the parsed constant 0.99
          round(lit(0.99) * (col("u").cast("double") /
            col("usum").cast("double")) + lit(eps) / col("m"), 6)
            .as("weight"))
        .orderBy(col("source"))
    },

    // §2.3 (round 14) — LEAVE-ONE-SOURCE-OUT ablation audit (the
    // Shapley-flavored "what does each source contribute" question,
    // answered the cheap exact way: for additive corpus statistics,
    // removing source s needs no rescan — LOO(s) = (T − t_s)/(N − n_s)
    // from the per-source partials). Published per source: the
    // corpus mean-length and long-doc share WITHOUT it, and the
    // deltas vs the full corpus — the triage table before dropping
    // or reweighting a source (q234's DoReMi step is the reweighting
    // sibling). ONE partial-agg groupBy + a broadcast 1-row totals
    // frame; exact integer sums to one IEEE division per statistic.
    "q251_source_ablation" -> { (s, d) =>
      val per = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_s"),
          sum(col("n_chars")).as("chars_s"),
          sum((col("n_chars") >= 300).cast("long")).as("long_s"))
      val tot = per.agg(sum(col("n_s")).as("n"),
        sum(col("chars_s")).as("chars"), sum(col("long_s")).as("longs"))
      // nullif guard: a single-source corpus makes n − n_s = 0; Spark's
      // integer division yields NULL but DuckDB's double division
      // yields ±inf/NaN, so without the shared NULLIF the oracle hash
      // would silently diverge on the degenerate input. Both engines
      // now publish NULL for the no-other-source row.
      val denom = nullif(col("n") - col("n_s"), lit(0L))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_s").as("n_docs"),
          round((col("chars") - col("chars_s")).cast("double")
            / denom, 6).as("loo_mean_chars"),
          round((col("chars") - col("chars_s")).cast("double")
            / denom
            - col("chars").cast("double") / col("n"), 6).as("delta_mean"),
          round((col("longs") - col("long_s")).cast("double")
            / denom, 6).as("loo_share_long"),
          round((col("longs") - col("long_s")).cast("double")
            / denom
            - col("longs").cast("double") / col("n"), 6).as("delta_share"))
        .orderBy(col("source"))
    }
  )

  /** q59's md5-LSH + recursive-closure oracle, reused for the apply
    * step: a doc is removed iff its component minimum is not itself.
    */
  val oracleSql: Map[String, String] = Map(

    "q251_source_ablation" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars_s,
        |    CAST(SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS long_s
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n,
        |    CAST(SUM(chars_s) AS BIGINT) AS chars,
        |    CAST(SUM(long_s) AS BIGINT) AS longs FROM per)
        |SELECT source, n_s AS n_docs,
        |  ROUND(CAST(chars - chars_s AS DOUBLE) / NULLIF(n - n_s, 0), 6)
        |    AS loo_mean_chars,
        |  ROUND(CAST(chars - chars_s AS DOUBLE) / NULLIF(n - n_s, 0)
        |    - CAST(chars AS DOUBLE) / n, 6) AS delta_mean,
        |  ROUND(CAST(longs - long_s AS DOUBLE) / NULLIF(n - n_s, 0), 6)
        |    AS loo_share_long,
        |  ROUND(CAST(longs - long_s AS DOUBLE) / NULLIF(n - n_s, 0)
        |    - CAST(longs AS DOUBLE) / n, 6) AS delta_share
        |FROM per CROSS JOIN tot ORDER BY source""".stripMargin,

    "q150_reservoir_sample" ->
      """WITH t AS (
        |  SELECT source, doc_id, n_chars,
        |    list_min([CAST(('0x' || substr(md5('q150:' || CAST(doc_id AS VARCHAR)
        |                || ':' || CAST(j AS VARCHAR)), 1, 12)) AS BIGINT)
        |              for j in generate_series(1, n_chars)]) AS ticket
        |  FROM documents)
        |SELECT source, doc_id, n_chars, rnk FROM (
        |  SELECT source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY ticket DESC, doc_id) AS INTEGER) AS rnk
        |  FROM (SELECT source, doc_id, n_chars, -ticket AS ticket FROM t))
        |WHERE rnk <= 20
        |ORDER BY source, rnk""".stripMargin,

    "q151_temperature_mix" ->
      """WITH s AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS src_chars
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(src_chars) AS BIGINT) AS total_chars,
        |             SUM(sqrt(src_chars)) AS z FROM s)
        |SELECT source, src_chars,
        |  ROUND(CAST(src_chars AS DOUBLE) / total_chars, 6) AS share_raw,
        |  ROUND(sqrt(src_chars) / z, 6) AS share_temp,
        |  ROUND(LEAST(1.0, (total_chars / 2.0) * (sqrt(src_chars) / z)
        |    / src_chars), 6) AS keep_rate,
        |  ROUND(src_chars * LEAST(1.0, (total_chars / 2.0) * (sqrt(src_chars) / z)
        |    / src_chars), 6) AS expected_chars
        |FROM s CROSS JOIN t
        |ORDER BY source""".stripMargin,

    // identical double expression order as the Spark side: alloc =
    // 2.0 * total * (sqrt/z), epochs = alloc / src
    "q176_epoch_schedule" ->
      """WITH s AS (
        |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS src_chars
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(SUM(src_chars) AS BIGINT) AS total_chars,
        |             SUM(sqrt(src_chars)) AS z FROM s)
        |SELECT source, src_chars,
        |  ROUND(sqrt(src_chars) / z, 6) AS share_temp,
        |  ROUND(2.0 * total_chars * (sqrt(src_chars) / z), 6) AS alloc_chars,
        |  ROUND(2.0 * total_chars * (sqrt(src_chars) / z) / src_chars, 6)
        |    AS epochs_raw,
        |  ROUND(LEAST(4.0, 2.0 * total_chars * (sqrt(src_chars) / z) / src_chars), 6)
        |    AS epochs,
        |  CASE WHEN 2.0 * total_chars * (sqrt(src_chars) / z) / src_chars > 4.0
        |       THEN 'repeat_capped'
        |       WHEN 2.0 * total_chars * (sqrt(src_chars) / z) / src_chars > 1.0
        |       THEN 'repeat'
        |       ELSE 'fresh' END AS verdict
        |FROM s CROSS JOIN t
        |ORDER BY source""".stripMargin,

    // identical rank order and double expression as the Spark side
    "q186_length_gini" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY n_chars, doc_id) AS rk
        |  FROM documents),
        |a AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |    CAST(SUM(rk * n_chars) AS BIGINT) AS srx
        |  FROM r GROUP BY source)
        |SELECT source, n_docs, total_chars,
        |  ROUND((2.0 * srx) / (n_docs * total_chars)
        |        - (n_docs + 1) / n_docs, 6) AS gini
        |FROM a ORDER BY source""".stripMargin,

    "q148_density_prune" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |cnt AS (
        |  SELECT b.vec_id AS id, COUNT(*) AS density
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id
        |  WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.2
        |  GROUP BY b.vec_id)
        |SELECT e.vec_id, CAST(COALESCE(c.density, 0) AS BIGINT) AS density,
        |  CASE WHEN COALESCE(c.density, 0) <= 5
        |         OR CAST(('0x' || substr(md5('dp:' || CAST(e.vec_id AS VARCHAR)), 1, 6)) AS BIGINT)
        |            / 16777216.0 < 5.0 / c.density
        |       THEN 'keep' ELSE 'prune' END AS verdict
        |FROM e LEFT JOIN cnt c ON c.id = e.vec_id
        |ORDER BY e.vec_id""".stripMargin,

    "q79_dedup_apply" ->
      s"""WITH RECURSIVE $corpusSql,
         |w AS (SELECT doc_id, $wsSql AS ws FROM corpus),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([array_to_string(ws[i:i+2],' ') for i in generate_series(1, len(ws)-2)]) AS sh
         |       FROM w WHERE len(ws) >= 3),
         |seeds AS (SELECT unnest(generate_series(0,7)) AS seed),
         |sigs AS (SELECT doc_id, seed,
         |           MIN(substr(md5(sh), seed*4+1, 4)) AS minhash
         |         FROM sh CROSS JOIN seeds GROUP BY doc_id, seed),
         |bands AS (SELECT doc_id, seed // 4 AS band,
         |            md5(string_agg(minhash, ',' ORDER BY seed)) AS band_sig
         |          FROM sigs GROUP BY doc_id, seed // 4),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |          FROM bands a JOIN bands b
         |            ON a.band = b.band AND a.band_sig = b.band_sig
         |           AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT a, b FROM edges
         |          UNION
         |          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |removed AS (SELECT a AS doc_id FROM reach
         |            GROUP BY a HAVING least(a, MIN(b)) <> a)
         |SELECT doc_id FROM corpus
         |WHERE doc_id NOT IN (SELECT doc_id FROM removed)
         |ORDER BY doc_id""".stripMargin,

    "q80_entropy" ->
      """SELECT doc_id, ROUND(entropy(c), 6) AS char_entropy
        |FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q81_curriculum_topk" ->
      """SELECT lang, rank, doc_id, distinct_ratio FROM (
        |  SELECT lang, doc_id, distinct_ratio,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY distinct_ratio DESC, doc_id ASC) AS rank
        |  FROM (
        |    SELECT doc_id, lang,
        |      ROUND(CAST(len(list_distinct(regexp_extract_all(lower(text), '\S+'))) AS DOUBLE)
        |        / len(regexp_extract_all(text, '\S+')), 6) AS distinct_ratio
        |    FROM documents))
        |WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin,

    "q105_grouped_split" ->
      """SELECT doc_id, source,
        |  CASE WHEN substr(md5('q105:' || source), 1, 1) IN ('0','1','2')
        |       THEN 'holdout' ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q109_weighted_sample" ->
      """SELECT doc_id, n_chars,
        |  ROUND(LEAST(0.9, GREATEST(0.1, n_chars / 400.0)), 6) AS keep_p
        |FROM documents
        |WHERE CAST(('0x' || substr(md5('q109:' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
        |      / 16777216.0
        |    < LEAST(0.9, GREATEST(0.1, n_chars / 400.0))
        |ORDER BY doc_id""".stripMargin,

    "q82_quota_sample" ->
      """SELECT lang, pick, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('q82:' || CAST(doc_id AS VARCHAR)), doc_id) AS pick
        |  FROM documents)
        |WHERE pick <= 50
        |ORDER BY lang, pick""".stripMargin,

    "q116_mix_weights" ->
      s"""WITH w AS (SELECT source, len($wsSql) AS tok FROM documents),
         |s AS (SELECT source, CAST(SUM(tok) AS BIGINT) AS src_tokens
         |      FROM w GROUP BY source),
         |t AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS total,
         |             COUNT(*) AS n_sources FROM s)
         |SELECT source, src_tokens,
         |  ROUND(LEAST(1.0, (CAST(total AS DOUBLE) / n_sources) / src_tokens), 6)
         |    AS keep_rate,
         |  ROUND(src_tokens * LEAST(1.0, (CAST(total AS DOUBLE) / n_sources) / src_tokens), 6)
         |    AS expected_tokens
         |FROM s CROSS JOIN t ORDER BY source""".stripMargin,

    "q118_dsir_select" ->
      s"""WITH w AS (SELECT doc_id, lang, $wsSql AS ws FROM documents),
         |w0 AS (SELECT doc_id, lang, unnest(ws) AS word FROM w),
         |words AS (SELECT doc_id, lang,
         |            ('0x' || substr(md5(word), 1, 8))::UBIGINT % 512 AS bkt
         |          FROM w0),
         |cr AS (SELECT bkt, COUNT(*) AS cr FROM words GROUP BY bkt),
         |ct AS (SELECT bkt, COUNT(*) AS ct FROM words WHERE lang = 'en' GROUP BY bkt),
         |nr AS (SELECT COUNT(*) AS nr FROM words),
         |nt AS (SELECT COUNT(*) AS nt FROM words WHERE lang = 'en'),
         |delta AS (SELECT cr.bkt,
         |            CAST(ln(CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE) / (nt.nt + 512))
         |               - ln(CAST(cr.cr + 1 AS DOUBLE) / (nr.nr + 512))
         |                 AS DECIMAL(18,12)) AS delta
         |          FROM cr LEFT JOIN ct USING (bkt) CROSS JOIN nr CROSS JOIN nt),
         |doc AS (SELECT doc_id, COUNT(*) AS n_feats,
         |          ROUND(CAST(SUM(delta) AS DOUBLE), 6) AS log_ratio
         |        FROM words JOIN delta USING (bkt) GROUP BY doc_id)
         |SELECT * FROM (
         |  SELECT doc_id, n_feats, log_ratio FROM doc
         |  ORDER BY log_ratio DESC, doc_id LIMIT 200)
         |ORDER BY doc_id""".stripMargin,

    "q124_source_overlap" ->
      s"""WITH w AS (SELECT source, $wsSql AS ws FROM documents),
         |sh AS (SELECT DISTINCT source,
         |         unnest([array_to_string(ws[i:i+2],' ')
         |                 for i in generate_series(1, len(ws)-2)]) AS sh
         |       FROM w WHERE len(ws) >= 3),
         |cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh
         |        FROM sh GROUP BY 1),
         |inter AS (SELECT a.source AS s1, b.source AS s2,
         |            CAST(COUNT(*) AS BIGINT) AS n_inter
         |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
         |          GROUP BY 1, 2),
         |pairs AS (SELECT a.source AS s1, b.source AS s2,
         |            a.n_sh AS n_a, b.n_sh AS n_b
         |          FROM cnt a JOIN cnt b ON a.source < b.source)
         |SELECT p.s1, p.s2, CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
         |  p.n_a, p.n_b,
         |  ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         |        / (p.n_a + p.n_b - COALESCE(i.n_inter, 0)), 6) AS jaccard
         |FROM pairs p LEFT JOIN inter i USING (s1, s2)
         |ORDER BY s1, s2""".stripMargin,

    "q125_topic_assign" ->
      """WITH c AS (SELECT vec_id AS topic_id, embedding AS centroid
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT e.vec_id, c.topic_id,
        |        round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                     CAST(c.centroid AS DOUBLE[])), 6) AS sim
        |      FROM embeddings e CROSS JOIN c),
        |r AS (SELECT vec_id, topic_id, sim,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY sim DESC, topic_id ASC) AS rn
        |      FROM s)
        |SELECT vec_id, topic_id, CAST(sim AS DOUBLE) AS cos_sim
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "q126_vocab_coverage" ->
      s"""WITH words AS (SELECT source, unnest($wsSql) AS w FROM documents),
         |vocab AS (SELECT w FROM (
         |  SELECT w, COUNT(*) AS cnt FROM words GROUP BY w
         |  ORDER BY cnt DESC, w LIMIT 512))
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN w IN (SELECT w FROM vocab) THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_covered,
         |  ROUND(CAST(SUM(CASE WHEN w IN (SELECT w FROM vocab) THEN 1 ELSE 0 END)
         |             AS DOUBLE) / COUNT(*), 6) AS coverage
         |FROM words GROUP BY source ORDER BY source""".stripMargin,

    "q127_winsorized_stats" ->
      """WITH vc AS (SELECT source, n_chars, COUNT(*) AS cnt
        |            FROM documents GROUP BY 1, 2),
        |cum AS (SELECT source, n_chars, cnt,
        |          SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars) AS cum
        |        FROM vc),
        |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n
        |        FROM vc GROUP BY 1),
        |b AS (SELECT c.source, t.n,
        |        MIN(CASE WHEN c.cum >= (t.n + 9) // 10 THEN c.n_chars END) AS lo,
        |        MIN(CASE WHEN c.cum >= (t.n * 9 + 9) // 10 THEN c.n_chars END) AS hi
        |      FROM cum c JOIN tot t USING (source) GROUP BY 1, 2)
        |SELECT d.source, b.n, b.lo, b.hi,
        |  ROUND(CAST(SUM(LEAST(GREATEST(d.n_chars, b.lo), b.hi)) AS DOUBLE)
        |        / b.n, 6) AS win_mean
        |FROM documents d JOIN b USING (source)
        |GROUP BY 1, 2, 3, 4 ORDER BY d.source""".stripMargin,

    "q128_cluster_canonical" ->
      s"""WITH RECURSIVE $corpusSql,
         |w AS (SELECT doc_id, $wsSql AS ws FROM corpus),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([array_to_string(ws[i:i+2],' ') for i in generate_series(1, len(ws)-2)]) AS sh
         |       FROM w WHERE len(ws) >= 3),
         |seeds AS (SELECT unnest(generate_series(0,7)) AS seed),
         |sigs AS (SELECT doc_id, seed,
         |           MIN(substr(md5(sh), seed*4+1, 4)) AS minhash
         |         FROM sh CROSS JOIN seeds GROUP BY doc_id, seed),
         |bands AS (SELECT doc_id, seed // 4 AS band,
         |            md5(string_agg(minhash, ',' ORDER BY seed)) AS band_sig
         |          FROM sigs GROUP BY doc_id, seed // 4),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |          FROM bands a JOIN bands b
         |            ON a.band = b.band AND a.band_sig = b.band_sig
         |           AND a.doc_id < b.doc_id),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION SELECT doc_b, doc_a FROM pairs),
         |reach AS (SELECT a, b FROM edges
         |          UNION
         |          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |comp AS (SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id
         |         FROM reach GROUP BY a),
         |qual AS (SELECT doc_id,
         |           ROUND(CAST(len(list_distinct(regexp_extract_all(lower(text), '\\S+'))) AS DOUBLE)
         |                 / len(regexp_extract_all(text, '\\S+')), 6) AS dr
         |         FROM corpus),
         |canon AS (SELECT cluster_id, doc_id AS canonical_id FROM (
         |  SELECT c.cluster_id, c.doc_id,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY q.dr DESC, c.doc_id ASC) AS rn
         |  FROM comp c JOIN qual q USING (doc_id)) WHERE rn = 1)
         |SELECT c.doc_id, c.cluster_id, n.canonical_id,
         |  c.doc_id = n.canonical_id AS is_canonical
         |FROM comp c JOIN canon n USING (cluster_id)
         |ORDER BY c.doc_id""".stripMargin,

    "q143_source_scorecard" ->
      s"""WITH w AS (SELECT doc_id, source, $wsSql AS ws FROM documents),
         |h AS (SELECT doc_id, source, md5(array_to_string(ws, ' ')) AS h FROM w),
         |hc AS (SELECT h, COUNT(*) AS nh FROM h GROUP BY h),
         |q AS (SELECT doc_id,
         |        length(text) AS n_chars,
         |        len(regexp_extract_all(text, '\\S+')) AS n_words,
         |        len(regexp_extract_all(lower(text), '\\b(the|a|of|and|to)\\b')) AS n_stop,
         |        len(list_distinct(regexp_extract_all(lower(text), '\\S+'))) AS n_distinct
         |      FROM documents),
         |k AS (SELECT doc_id,
         |        CASE WHEN n_words >= 10 AND n_stop > 0
         |              AND CAST(n_distinct AS DOUBLE) / n_words > 0.2
         |             THEN 1 ELSE 0 END AS keep,
         |        n_chars, n_words
         |      FROM q),
         |j AS (SELECT h.doc_id, h.source, hc.nh > 1 AS is_dup,
         |        k.keep, k.n_chars, k.n_words
         |      FROM h JOIN hc ON h.h = hc.h JOIN k ON k.doc_id = h.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  ROUND(CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*), 6) AS dup_rate,
         |  CAST(SUM(keep) AS BIGINT) AS n_keep,
         |  ROUND(CAST(SUM(keep) AS DOUBLE) / COUNT(*), 6) AS keep_rate,
         |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS mean_chars,
         |  ROUND(CAST(SUM(n_words) AS DOUBLE) / COUNT(*), 6) AS mean_words
         |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "q130_dup_leakage" ->
      s"""WITH ${TextQueries.bandsSqlFrom("documents", "")},
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |          FROM bands a JOIN bands b
         |            ON a.band = b.band AND a.band_sig = b.band_sig
         |           AND a.doc_id < b.doc_id)
         |SELECT LEAST(sa.source, sb.source) AS s1,
         |  GREATEST(sa.source, sb.source) AS s2,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  LEAST(sa.source, sb.source) <> GREATEST(sa.source, sb.source)
         |    AS cross_source
         |FROM pairs p
         |JOIN documents sa ON p.doc_a = sa.doc_id
         |JOIN documents sb ON p.doc_b = sb.doc_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // each CTE mirrors one chain stage exactly; stage membership is
    // computed on the same survivor set as the Spark plan
    "q136_curation_chain" ->
      s"""WITH nrm AS (SELECT doc_id, nfc_normalize(text) AS text FROM documents),
         |corpus AS (SELECT * FROM nrm WHERE doc_id >= 20),
         |qq AS (SELECT doc_id,
         |         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
         |         ROUND(CAST(len(list_distinct(regexp_extract_all(lower(text), '\\S+'))) AS DOUBLE)
         |               / len(regexp_extract_all(text, '\\S+')), 6) AS dr,
         |         CAST(len(regexp_extract_all(text, '\\S+')) >= 10
         |              AND len(regexp_extract_all(lower(text), '\\b(the|a|of|and|to)\\b')) > 0
         |              AND CAST(len(list_distinct(regexp_extract_all(lower(text), '\\S+'))) AS DOUBLE)
         |                  / len(regexp_extract_all(text, '\\S+')) > 0.2 AS INT) AS keep
         |       FROM corpus),
         |s1 AS (SELECT doc_id, dr, ws_tokens FROM qq WHERE keep = 1),
         |h AS (SELECT c.doc_id, md5(array_to_string($wsSql, ' ')) AS th
         |      FROM corpus c JOIN s1 USING (doc_id)),
         |dup AS (SELECT doc_id FROM h
         |        JOIN (SELECT th, MIN(doc_id) AS keep_id FROM h GROUP BY 1) USING (th)
         |        WHERE doc_id <> keep_id),
         |w AS (SELECT doc_id, $wsSql AS ws FROM nrm),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([array_to_string(ws[i:i+7],' ') for i in generate_series(1, len(ws)-7)]) AS sh
         |       FROM w WHERE len(ws) >= 8),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 20),
         |contam AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (sh)
         |           WHERE s.doc_id >= 20),
         |s3 AS (SELECT * FROM s1
         |       WHERE doc_id NOT IN (SELECT doc_id FROM dup)
         |         AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |r AS (SELECT doc_id,
         |        CAST(SUM(ws_tokens) OVER (ORDER BY dr DESC, doc_id ASC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |      FROM s3),
         |kept AS (SELECT doc_id, cum FROM r WHERE cum <= 15000)
         |SELECT d.doc_id,
         |  CASE WHEN d.doc_id < 20 THEN 'benchmark'
         |       WHEN qq.keep = 0 THEN 'quality'
         |       WHEN dup.doc_id IS NOT NULL THEN 'dup'
         |       WHEN contam.doc_id IS NOT NULL THEN 'contam'
         |       WHEN kept.cum IS NOT NULL THEN 'kept'
         |       ELSE 'budget' END AS verdict,
         |  qq.ws_tokens, kept.cum AS cum_tokens
         |FROM nrm d
         |LEFT JOIN qq ON qq.doc_id = d.doc_id
         |LEFT JOIN dup ON dup.doc_id = d.doc_id
         |LEFT JOIN contam ON contam.doc_id = d.doc_id
         |LEFT JOIN kept ON kept.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // identical closed-form least squares over the same top-200
    // (ln rank, ln freq) spectrum; ~200 bounded log terms per source
    // keep the double sums round(.,6)-stable across engines
    "q195_zipf_audit" ->
      s"""WITH f AS (
         |  SELECT source, w AS word, COUNT(*) AS freq
         |  FROM (SELECT source, unnest($wsSql) AS w FROM documents)
         |  GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(SUM(freq) AS BIGINT) AS n_tokens,
         |          CAST(COUNT(*) AS BIGINT) AS vocab
         |        FROM f GROUP BY source),
         |h AS (
         |  SELECT source, ln(CAST(rnk AS DOUBLE)) AS x,
         |         ln(CAST(freq AS DOUBLE)) AS y
         |  FROM (SELECT source, freq, word, row_number() OVER (PARTITION BY source
         |          ORDER BY freq DESC, word) AS rnk FROM f)
         |  WHERE rnk <= 200),
         |st AS (
         |  SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
         |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
         |  FROM h GROUP BY source)
         |SELECT st.source, tot.n_tokens, tot.vocab,
         |  CAST(st.n AS BIGINT) AS n_head,
         |  ROUND((st.n * st.sxy - st.sx * st.sy)
         |    / (st.n * st.sxx - st.sx * st.sx), 6) AS zipf_slope,
         |  ROUND((st.sy - ((st.n * st.sxy - st.sx * st.sy)
         |    / (st.n * st.sxx - st.sx * st.sx)) * st.sx) / st.n, 6)
         |    AS zipf_intercept,
         |  ROUND(tot.vocab / sqrt(CAST(tot.n_tokens AS DOUBLE)), 6)
         |    AS heaps_coeff
         |FROM st JOIN tot ON tot.source = st.source
         |ORDER BY st.source""".stripMargin,

    // same two-stage entropy: label-sized counts, exact double shares,
    // ln terms summed then rounded once
    "q203_class_balance" ->
      """WITH lab AS (SELECT label, COUNT(*) AS n FROM embeddings
        |             GROUP BY label),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
        |          CAST(COUNT(*) AS BIGINT) AS n_classes,
        |          MAX(n) AS n_max, MIN(n) AS n_min FROM lab),
        |ent AS (SELECT SUM(-(CAST(n AS DOUBLE) / total)
        |          * ln(CAST(n AS DOUBLE) / total)) AS ent
        |        FROM lab, tot)
        |SELECT l.label, CAST(l.n AS BIGINT) AS n,
        |  ROUND(CAST(l.n AS DOUBLE) / t.total, 6) AS share,
        |  t.n_classes,
        |  ROUND(CAST(t.n_max AS DOUBLE) / t.n_min, 6) AS imbalance_ratio,
        |  ROUND(e.ent, 6) AS entropy,
        |  ROUND(exp(e.ent), 6) AS effective_classes
        |FROM lab l, tot t, ent e ORDER BY l.label""".stripMargin,

    // identical closed form: ascending prefix pass, funded test,
    // single capped level; integer budget (total*9)//10
    "q206_water_filling" ->
      """WITH sup AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sup
        |             FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(sup) AS BIGINT) AS total,
        |          CAST(COUNT(*) AS BIGINT) AS n FROM sup),
        |r AS (
        |  SELECT s.source, s.sup, t.n, (t.total * 9) // 10 AS budget,
        |    CAST(row_number() OVER (ORDER BY s.sup, s.source) AS BIGINT) AS k,
        |    COALESCE(SUM(s.sup) OVER (ORDER BY s.sup, s.source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pprev
        |  FROM sup s, tot t),
        |f AS (SELECT *, sup <= CAST(budget - pprev AS DOUBLE) / (n - k + 1)
        |        AS funded FROM r),
        |lvl AS (SELECT CAST(SUM(CASE WHEN funded THEN sup ELSE 0 END)
        |          AS BIGINT) AS p_funded,
        |          CAST(SUM(CASE WHEN funded THEN 1 ELSE 0 END) AS BIGINT)
        |            AS n_funded
        |        FROM f)
        |SELECT f.source, f.sup AS supply, f.funded,
        |  ROUND(CAST(f.budget - l.p_funded AS DOUBLE)
        |    / (f.n - l.n_funded), 6) AS level,
        |  ROUND(CASE WHEN f.funded THEN CAST(f.sup AS DOUBLE)
        |       ELSE CAST(f.budget - l.p_funded AS DOUBLE)
        |         / (f.n - l.n_funded) END, 6) AS alloc
        |FROM f, lvl l ORDER BY f.source""".stripMargin,

    "q220_k_anonymity" ->
      """WITH g AS (
        |  SELECT source, lang, n_chars // 100 AS len_bkt,
        |    CAST(COUNT(*) AS BIGINT) AS g
        |  FROM documents GROUP BY source, lang, len_bkt)
        |SELECT source,
        |  CAST(SUM(g) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN g < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_suppressed,
        |  CAST(SUM(CASE WHEN g < 5 THEN g ELSE 0 END) AS BIGINT)
        |    AS rows_suppressed,
        |  CAST(SUM(CASE WHEN g >= 5 THEN g ELSE 0 END) AS BIGINT)
        |    AS rows_kept,
        |  CAST(COALESCE(MIN(CASE WHEN g >= 5 THEN g END), 0) AS BIGINT)
        |    AS k_achieved
        |FROM g GROUP BY source ORDER BY source""".stripMargin,

    "q222_rr_privacy" ->
      """WITH ty AS (
        |  SELECT event_type,
        |    CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) - 1
        |      AS idx
        |  FROM (SELECT DISTINCT event_type FROM events)),
        |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ty),
        |rep AS (
        |  SELECT e.event_type,
        |    CASE WHEN c.c16 < 4
        |         THEN (t.idx + 1 + (c.c16 % (mm.m - 1))) % mm.m
        |         ELSE t.idx END AS rep_idx
        |  FROM events e
        |  JOIN ty t USING (event_type)
        |  CROSS JOIN mm
        |  CROSS JOIN LATERAL (SELECT
        |    CAST(CAST(('0x' || substr(md5('q222:' ||
        |      CAST(e.event_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 16
        |      AS BIGINT) AS c16) c),
        |obs AS (
        |  SELECT t2.event_type, CAST(COUNT(*) AS BIGINT) AS reported_count
        |  FROM rep JOIN ty t2 ON rep.rep_idx = t2.idx
        |  GROUP BY t2.event_type),
        |tru AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_count
        |        FROM events GROUP BY event_type),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
        |SELECT tru.event_type, tru.true_count, obs.reported_count,
        |  ROUND((4.0 * (mm.m - 1) * obs.reported_count - tot.n)
        |    / (mm.m * 3 - 4), 6) AS debiased_est
        |FROM tru JOIN obs USING (event_type), tot, mm
        |ORDER BY event_type""".stripMargin,

    // identical md5 → identical IEEE ln/divide/floor chain as the
    // engine: the seeded-hash uniforms make the DP noise deterministic
    // and therefore exactly mirrorable
    "q264_dp_release" ->
      """WITH c AS (SELECT source AS grp, COUNT(*) AS c
        |           FROM documents GROUP BY source),
        |n AS (SELECT grp,
        |  c + CAST(floor(-ln(CAST(CAST(('0x' || substr(md5('q264:a:' || grp),
        |          1, 12)) AS BIGINT) + 1 AS DOUBLE)
        |        / CAST(281474976710656 AS DOUBLE))
        |      / CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    - CAST(floor(-ln(CAST(CAST(('0x' || substr(md5('q264:b:' || grp),
        |          1, 12)) AS BIGINT) + 1 AS DOUBLE)
        |        / CAST(281474976710656 AS DOUBLE))
        |      / CAST(0.5 AS DOUBLE)) AS BIGINT) AS noisy_count,
        |  CAST(NULL AS DOUBLE) AS epsilon,
        |  CAST(NULL AS VARCHAR) AS mechanism FROM c)
        |SELECT grp, noisy_count, epsilon, mechanism FROM (
        |  SELECT grp, noisy_count, epsilon, mechanism FROM n
        |  UNION ALL
        |  SELECT '__ledger__', (SELECT COUNT(*) FROM n),
        |    CAST(0.5 AS DOUBLE), 'discrete_laplace(parallel-composition)')
        |ORDER BY grp""".stripMargin,

    "q265_moore_lewis" ->
      s"""WITH words AS (SELECT doc_id, lang, unnest($wsSql) AS word
         |               FROM documents),
         |gen AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c_gen
         |        FROM words GROUP BY word),
         |ind AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c_in
         |        FROM words WHERE lang = 'en' GROUP BY word),
         |tot AS (SELECT CAST(SUM(c_gen) AS BIGINT) AS n_gen,
         |          COUNT(*) AS v,
         |          (SELECT CAST(COUNT(*) AS BIGINT) FROM words
         |           WHERE lang = 'en') AS n_in
         |        FROM gen),
         |lm AS (SELECT g.word,
         |    CAST(-ln(CAST(COALESCE(i.c_in, 0) + 1 AS DOUBLE)
         |             / (tot.n_in + tot.v)) AS DECIMAL(18,12)) AS nll_in,
         |    CAST(-ln(CAST(g.c_gen + 1 AS DOUBLE)
         |             / (tot.n_gen + tot.v)) AS DECIMAL(18,12)) AS nll_gen
         |  FROM gen g LEFT JOIN ind i USING (word) CROSS JOIN tot),
         |sc AS (SELECT w.doc_id, COUNT(*) AS n_words,
         |    ROUND(CAST(SUM(lm.nll_in) AS DOUBLE) / COUNT(*), 6) AS ce_in,
         |    ROUND(CAST(SUM(lm.nll_gen) AS DOUBLE) / COUNT(*), 6) AS ce_gen
         |  FROM words w JOIN lm USING (word) GROUP BY w.doc_id)
         |SELECT doc_id, n_words, ce_in, ce_gen,
         |  ROUND(ce_in - ce_gen, 6) AS ml_score,
         |  ROUND(ce_in - ce_gen, 6) < 0.0 AS selected
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q266_ccnet_buckets" ->
      s"""WITH w AS (SELECT doc_id, lang, unnest($wsSql) AS word
         |           FROM documents),
         |wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c
         |       FROM w GROUP BY word),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM wc),
         |surp AS (SELECT word,
         |           CAST(-ln(CAST(c AS DOUBLE) / tot.total)
         |                AS DECIMAL(18,12)) AS surp
         |         FROM wc, tot),
         |sc AS (SELECT w.doc_id, w.lang,
         |         ROUND(CAST(SUM(surp) AS DOUBLE) / COUNT(*), 6)
         |           AS mean_surprisal
         |       FROM w JOIN surp USING (word) GROUP BY w.doc_id, w.lang)
         |SELECT doc_id, lang, mean_surprisal,
         |  CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM (SELECT sc.*, ntile(3) OVER (PARTITION BY lang
         |        ORDER BY mean_surprisal, doc_id) AS nt FROM sc)
         |ORDER BY doc_id""".stripMargin,

    "q234_doremi_step" ->
      s"""WITH words AS (SELECT source, unnest($wsSql) AS w FROM documents),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM words),
         |surp AS (
         |  SELECT w, CAST(-ln(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(tot.ntot))
         |    AS DECIMAL(18,12)) AS surp
         |  FROM words, tot GROUP BY w),
         |per_src AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |    SUM(surp) AS ssum
         |  FROM words JOIN surp USING (w) GROUP BY source),
         |ref AS (
         |  SELECT ROUND(CAST(SUM(ssum) AS DOUBLE) / SUM(n_tokens), 6)
         |    AS ref_loss, CAST(COUNT(*) AS BIGINT) AS m
         |  FROM per_src),
         |upd AS (
         |  SELECT source, n_tokens,
         |    ROUND(CAST(ssum AS DOUBLE) / n_tokens, 6) AS loss,
         |    ref.ref_loss, ref.m,
         |    ROUND(GREATEST(0.0,
         |      ROUND(CAST(ssum AS DOUBLE) / n_tokens, 6) - ref.ref_loss), 6)
         |      AS excess
         |  FROM per_src, ref),
         |u AS (SELECT *, CAST(ROUND(exp(0.1 * excess), 6) AS DECIMAL(18,6))
         |        AS u FROM upd),
         |norm AS (SELECT SUM(u) AS usum FROM u)
         |SELECT source, n_tokens, loss, ref_loss, excess,
         |  ROUND(0.99 * (CAST(u AS DOUBLE) / CAST(norm.usum AS DOUBLE))
         |    + 0.01 / m, 6) AS weight
         |FROM u, norm ORDER BY source""".stripMargin,

    "q239_l_diversity" ->
      """WITH g AS (
        |  SELECT source, n_chars // 100 AS len_bkt,
        |    CAST(COUNT(*) AS BIGINT) AS g,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS ndiv
        |  FROM documents GROUP BY source, len_bkt)
        |SELECT source, CAST(SUM(g) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(CASE WHEN ndiv < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS groups_violating,
        |  CAST(SUM(CASE WHEN ndiv < 3 THEN g ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  CAST(MIN(ndiv) AS BIGINT) AS min_diversity
        |FROM g GROUP BY source ORDER BY source""".stripMargin
  )
}
