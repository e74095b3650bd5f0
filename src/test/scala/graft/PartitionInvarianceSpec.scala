package graft

/** Partitioning-invariance lock-in: a result that changes when
  * spark.sql.shuffle.partitions changes is a result that will change
  * between local[32] and a 1000-executor cluster. Every determinism
  * discipline in the engine — DECIMAL-quantized sums, sorted
  * collapses, content-hash sampling, rank tie-breaks, min-based
  * keeper election — exists to make this spec true; here it is pinned
  * directly for the riskiest shapes (aggregation-order, iterative,
  * sampling, window, and collect_list-bearing queries) instead of
  * only being implied by the single-partitioning oracle gate.
  */
class PartitionInvarianceSpec extends SparkSpecBase {

  // shapes most likely to leak partitioning: string collapses,
  // iterative fixpoints, decimal log-sums, hash sampling, reservoir
  // ticket races, keeper elections, windowed EWMA, packed shards
  private val queries = Seq(
    "q09_collapse_flags",   // sorted string-collapse agg
    "q31b_lsh_pairs",       // banded pair generation
    "q52_train_split",      // hash split
    "q59_dup_clusters",     // connected components fixpoint
    "q72_stratified_sample",
    "q74_zscore",           // exact decimal moments
    "q85_shard_shuffle",    // deterministic global shuffle
    "q91_pagerank",         // iterative decimal power iteration
    "q101_surprisal",       // decimal log-sums
    "q113_topk_native",     // native top-k tie-breaks
    "q150_reservoir_sample",
    "q156_exact_substr",    // island merge over windows
    "q159_para_dedup",      // min-rank keeper election
    "q160_js_drift",        // decimal JS terms + closed form
    "q163_ewma_anomaly",    // frame-ordered weighted sums
    "q172_aspect_batch",    // grouped distributed prefix sum
    "q174_dedup_recall",    // three pair generators composed
    "q177_ndcg_graded",     // per-group double DCG sums (≤ 3 terms)
    // round-11 risk shapes: greedy integer argmax fold, double
    // regression sums over the rank head, ratio-ranked top-50 cut,
    // mergeable chunk-index rollup
    "q195_zipf_audit",
    "q197_mmr_select",
    "q198_pmi_collocations",
    "q200_cdc_index_merge",
    "q204_chat_template",   // collect_list order normalized by sort_array
    "q206_water_filling",   // funded test on integer-derived doubles
    // round-15 risk shapes: KN's three-way LM join + decimal NLL sums,
    // hard-EM fixpoint with broadcast-map Viterbi, seeded-hash DP
    // noise, OOV left-join log-sums, ntile cuts on rounded doubles
    "q263_kneser_ney",
    "q267_kn_trigram",
    "q262_unigram_vocab",
    "q264_dp_release",
    "q265_moore_lewis",
    "q266_ccnet_buckets")

  private def rowsOf(name: String): Set[String] = {
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf)
      .collect().map(_.toString).toSet
  }

  test("results are identical under 1, 4 and 13 shuffle partitions") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      val diverged = queries.flatMap { name =>
        val bySetting = Seq("1", prev, "13").map { p =>
          spark.conf.set(key, p)
          rowsOf(name)
        }
        if (bySetting.distinct.size == 1) None
        else Some(s"$name: results depend on $key " +
          s"(sizes ${bySetting.map(_.size).mkString("/")})")
      }
      assert(diverged.isEmpty, diverged.mkString("; "))
    } finally spark.conf.set(key, prev)
  }
}
