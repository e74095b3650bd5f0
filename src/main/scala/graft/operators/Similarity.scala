package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.Caching.ScopedPersist

/** SURVEY.md §2.3 #34-35 — similarity search over an embedding column.
  *
  * `bruteForceTopK` is the correctness baseline (query side broadcast,
  * one pass over the corpus — linear, but exact). `annLsh` is the
  * 100 TB path: hyperplane-LSH bucket join, cost ∝ bucket occupancy
  * instead of corpus size.
  */
object Similarity {

  /** Scalar int8 quantization of the embedding column — the 4×
    * storage/bandwidth shrink every 100 TB vector corpus applies
    * before ANN serving. Per-vector (min, max) range, 255 levels,
    * codes in 0..255; entirely narrow array expressions (one pass,
    * no shuffle). Dequantization error is bounded by half a level:
    * |x − dequant(code)| ≤ (max−min)/255/2 (+ float→double noise),
    * asserted in spec. Constant vectors (max == min) code to 0.
    */
  def quantizeInt8(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    embs
      .select(col(idCol).as("vec_id"),
        col(vecCol).as("__v"),
        array_min(col(vecCol)).cast("double").as("q_min"),
        array_max(col(vecCol)).cast("double").as("q_max"))
      .select(col("vec_id"), col("q_min"), col("q_max"),
        expr("transform(__v, x -> cast(round((cast(x AS double) - q_min) * 255.0D" +
          " / greatest(q_max - q_min, 1e-30D)) AS int))").as("codes"))

  /** Exact top-k cosine neighbors for each query vector. The query set
    * is expected to be small and is broadcast; the corpus is scanned
    * once (narrow), then one shuffle on query_id for the top-k window.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(GraftFunctions.cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Embedding near-dup pairs: LSH-bucket the corpus (nTables
    * hyperplane signatures), pair within buckets, rescore with the
    * exact cosine expression, keep pairs ≥ threshold. The 100 TB
    * dedup path — cost ∝ Σ bucket², never corpus².
    */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
                     nTables: Int = 4, nBits: Int = 8): DataFrame = {
    val sigCols = (0 until nTables).map(t =>
      GraftFunctions.hyperplaneSig(col("embedding"), lit(nBits), seed = 1000L + t)
        .as(s"sig_$t"))
    val sig = corpus.select(col("vec_id") +: col("embedding") +: sigCols: _*).scopedPersist()
    val byTable = (0 until nTables).map { t =>
      val a = sig.select(col("vec_id").as("vec_a"),
        col("embedding").as("emb_a"), col(s"sig_$t").as("bk"))
      val b = sig.select(col("vec_id").as("vec_b"),
        col("embedding").as("emb_b"), col(s"sig_$t").as("bk"))
      a.join(b, Seq("bk")).filter(col("vec_a") < col("vec_b")).drop("bk")
    }
    byTable.reduce(_ unionByName _).distinct()
      .select(col("vec_a"), col("vec_b"),
        round(GraftFunctions.cosine(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** IVF (inverted-file) ANN: coarse-quantize the corpus into
    * nCentroids cells (Lloyd iterations from deterministic seed
    * vectors), then answer queries by scoring only the nProbe nearest
    * cells. The centroid table stays DATAFRAME-RESIDENT across
    * iterations — no driver collect anywhere in the loop, so a
    * 65k×1024-dim codebook (≈256 MB) never rides the driver heap as
    * user state. With `distributedCentroids=false` (the small-k
    * default) each assignment pass carries a broadcast hint — one
    * broadcast-join pass over the corpus; with `true` the hint is
    * dropped and Catalyst/AQE picks the join strategy from actual
    * sizes, the big-codebook path. Assignments and scoring are
    * distributed either way; each query touches
    * |corpus|·nProbe/nCentroids vectors.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 6, iters: Int = 2,
              distributedCentroids: Boolean = false): DataFrame = {
    val cents = ivfTrain(corpus, nCentroids, iters, distributedCentroids)
    val cells = ivfAssign(cents, corpus, distributedCentroids)
      .select(col("vec_id").as("neighbor_id"), col("embedding"), col("cid"))
    val probes = ivfProbes(cents, queries, nProbe, distributedCentroids)
    val scored = probes.join(cells, "cid")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(GraftFunctions.cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  private def maybeBroadcast(cents: DataFrame, distributed: Boolean): DataFrame =
    if (distributed) cents else broadcast(cents)

  /** Lloyd-train the IVF coarse quantizer: (cid, cemb), DataFrame-
    * resident throughout (see [[ivfTopK]] docs). Shared by IVF and
    * IVF-PQ ([[Pq.ivfPqTopK]]). */
  def ivfTrain(corpus: DataFrame, nCentroids: Int = 16, iters: Int = 2,
               distributedCentroids: Boolean = false): DataFrame = {
    // deterministic init: the nCentroids lowest-id vectors seed the
    // cells, assigned cid by RANK (not `vec_id < n`, which under-seeds
    // on sparse or non-0-based ids). TakeOrdered + an n-row window.
    var cents: DataFrame = corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(nCentroids)
      .withColumn("cid",
        (row_number().over(Window.orderBy(col("vec_id"))) - 1).cast("int"))
      .select(col("cid"), col("embedding").as("cemb"))
    (0 until iters).foreach { _ =>
      // persist each round's centroid table: truncates the per-round
      // lineage (iters× plan growth otherwise) and is the frame every
      // corpus row joins against next round. CacheScope reclaims it.
      // The per-round take(1) stays EAGER on purpose (round 17,
      // measured): lazily-materialized rounds get computed redundantly
      // by racing broadcast-build threads downstream — see
      // Pq.trainCodebooks for the measurement note.
      val means = ivfAssign(cents, corpus, distributedCentroids)
        .select(col("cid"), posexplode(col("embedding")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m").cast("float")).as("cemb"))
        .scopedPersist()
      // empty-means guard (degenerate seed filter): keep prior round
      if (means.take(1).nonEmpty) cents = means
    }
    cents
  }

  /** Nearest-cell assignment: input (vec_id, embedding, …) gains a
    * `cid` column (argmax cosine, ties → smallest cid). */
  def ivfAssign(cents: DataFrame, df: DataFrame,
                distributedCentroids: Boolean = false): DataFrame =
    ivfAssignScored(cents, df, distributedCentroids).drop("sim")

  /** [[ivfAssign]] keeping the winning cosine as `sim` — the
    * assignment-QUALITY signal the drift→rebuild advisory
    * ([[Pq.rebuildAdvisory]]) monitors: a corpus that drifts away
    * from the frozen centroids shows falling per-cell mean sim. */
  def ivfAssignScored(cents: DataFrame, df: DataFrame,
                      distributedCentroids: Boolean = false): DataFrame = {
    require(!df.columns.contains("sim"),
      "ivfAssignScored emits a 'sim' column (and ivfAssign drops it); an " +
        "input that already carries 'sim' would be silently clobbered — " +
        "rename it before assignment")
    if (distributedCentroids) {
      // big-codebook path: the centroid table cannot fold into one
      // broadcast row, so the argmax stays a join + per-key window
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("__sim").desc, col("cid").asc)
      df.crossJoin(cents)
        .withColumn("__sim", GraftFunctions.cosine(col("embedding"), col("cemb")))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .withColumn("sim", col("__sim"))
        .drop("__rn", "__sim", "cemb")
    } else {
      // round 17 (guide §2.4): the small-codebook argmax is ONE narrow
      // kernel call over a broadcast candidate array — the previous
      // crossJoin + Window.partitionBy(vec_id) shuffled AND sorted
      // nCentroids copies of the corpus per assignment pass (per Lloyd
      // round in training). Same cosine, same (sim desc, cid asc)
      // winner — bit-identical assignments, zero corpus-side exchanges.
      val cands = cents.groupBy()
        .agg(collect_list(struct(col("cid"), col("cemb"))).as("__cands"))
      df.crossJoin(broadcast(cands))
        .filter(size(col("__cands")) > 0) // empty-quantizer ≡ window path's empty join
        .withColumn("__best",
          GraftFunctions.nearestCentroidCosine(col("embedding"), col("__cands")))
        .withColumn("cid", col("__best").getField("cid"))
        .withColumn("sim", col("__best").getField("sim"))
        .drop("__best", "__cands")
    }
  }

  /** Per-query probe set: the nProbe nearest cells —
    * (query_id, q_emb, cid). */
  def ivfProbes(cents: DataFrame, queries: DataFrame, nProbe: Int,
                distributedCentroids: Boolean = false): DataFrame = {
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("cid").asc)
    queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(maybeBroadcast(cents, distributedCentroids))
      .withColumn("__sim", GraftFunctions.cosine(col("q_emb"), col("cemb")))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("cid"))
  }

  /** Approximate top-k: nTables independent hyperplane signatures
    * bucket the corpus; a query only scores vectors sharing a bucket
    * in at least one table. Recall grows with nTables; per-table
    * bucket width with 2^nBits. Both are plan-shape constants — the
    * physical plan is nTables bucket joins, unioned, deduped, then
    * the same top-k window as the exact path.
    *
    * Defaults are tuned for ≥0.6 recall on ~0.5-cosine neighbors
    * (p ≈ 1−θ/π ≈ 0.67 per bit ⇒ 0.67⁴ ≈ 0.2 per table ⇒
    * 1−0.8¹² ≈ 0.93 over 12 tables; asserted in DedupSimilaritySpec).
    * At larger corpus sizes raise nBits and nTables together: bucket
    * occupancy scales as corpus/2^nBits, recall as 1−(1−p^nBits)^nTables.
    */
  def annLsh(corpus: DataFrame, queries: DataFrame, k: Int,
             nTables: Int = 12, nBits: Int = 4): DataFrame = {
    val sigCols = (0 until nTables).map(t =>
      GraftFunctions.hyperplaneSig(col("embedding"), lit(nBits), seed = 1000L + t)
        .as(s"sig_$t"))
    val qSigCols = (0 until nTables).map(t =>
      GraftFunctions.hyperplaneSig(col("embedding"), lit(nBits), seed = 1000L + t)
        .as(s"qsig_$t"))
    // consumed once per table: persist so signatures are computed once
    val cSig = corpus.select(col("vec_id").as("neighbor_id") +: col("embedding") +: sigCols: _*)
      .scopedPersist()
    val qSig = broadcast(queries.select(
      col("vec_id").as("query_id") +: col("embedding").as("q_emb") +: qSigCols: _*))
    val perTable = (0 until nTables).map { t =>
      cSig.join(qSig, col(s"sig_$t") === col(s"qsig_$t")
        && col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("q_emb"), col("embedding"))
    }
    val candidates = perTable.reduce(_ unionByName _)
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates.select(col("query_id"), col("neighbor_id"),
      round(GraftFunctions.cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Semantic dedup (the SemDeDup curation step — Abbas et al. 2023,
    * arXiv:2303.09540): a per-document keep/drop VERDICT from
    * embedding-space near-duplicates. A doc drops iff some EARLIER
    * (smaller-id) doc has cosine ≥ tau with it; `dup_of` is the
    * smallest such id. This is the pairwise-threshold greedy variant:
    * deterministic, order-independent, and exactly reproducible by a
    * scan oracle — unlike cluster-representative selection, which
    * depends on the clustering.
    *
    * Threshold compares `round(cos, 6)` — the same render-stable
    * cosine every similarity query emits (SURVEY §5), so the keep/drop
    * boundary cannot flip on engine-specific last-ulp noise.
    *
    * This exact form scores all pairs (broadcast nested-loop — the
    * correctness BASELINE, same contract as [[bruteForceTopK]]):
    * bounded corpora only. [[semanticDedupLsh]] is the 100 TB path.
    */
  def semanticDedupExact(corpus: DataFrame, tau: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = corpus.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val dups = broadcast(a).join(b, col("a_id") < col("b_id"))
      .filter(round(GraftFunctions.cosine(col("a_emb"), col("b_emb")), 6) >= tau)
      .groupBy(col("b_id")).agg(min(col("a_id")).as("dup_of"))
    verdicts(corpus, dups)
  }

  /** [[semanticDedupExact]] through the LSH-bucketed pair generator
    * ([[cosineNearDups]]): cost ∝ Σ bucket², never corpus². Candidate
    * pairs ⊆ exact pairs, so drops ⊆ exact drops (one-sided error —
    * never drops a doc the exact rule keeps); recall on planted
    * duplicates asserted in spec.
    */
  def semanticDedupLsh(corpus: DataFrame, tau: Double,
                       nTables: Int = 8, nBits: Int = 6): DataFrame = {
    val dups = cosineNearDups(corpus, tau, nTables, nBits)
      .groupBy(col("vec_b").as("b_id")).agg(min(col("vec_a")).as("dup_of"))
    verdicts(corpus, dups)
  }

  private def verdicts(corpus: DataFrame, dups: DataFrame): DataFrame =
    corpus.join(dups, corpus("vec_id") === dups("b_id"), "left")
      .select(col("vec_id"),
        when(col("dup_of").isNull, "keep").otherwise("drop").as("verdict"),
        col("dup_of"))

  /** Density-based data pruning (round 8): score every vector by its
    * embedding-space NEIGHBORHOOD DENSITY (neighbor count at cosine ≥
    * tau) and keep a deterministic subsample that thins DENSE regions
    * — the "keep the hard/rare examples" selection rule from the
    * data-pruning literature: redundant points cluster, informative
    * ones sit in sparse regions.
    *
    *   keep ⇔ density ≤ floor  OR  hash01(vec_id) < floor/density
    *
    * so expected kept mass per dense region ≈ floor — an inverse-
    * density sampler with a hard keep-all floor. hash01 is the
    * md5-based uniform already used by every sampling op (content-
    * deterministic, no rand()).
    *
    * This exact form scores all pairs (broadcast nested-loop): the
    * correctness baseline, same contract as [[semanticDedupExact]].
    * The scale path reuses [[cosineNearDups]]' LSH bucket generator
    * for the density counts ([[densityPruneLsh]]): candidate pairs ⊆
    * exact pairs ⇒ LSH densities are UNDERcounts ⇒ it only ever keeps
    * MORE than the exact rule — one-sided error, never prunes a
    * sparse-region point the exact rule would keep.
    */
  def densityPruneExact(corpus: DataFrame, tau: Double,
                        floor: Int = 5): DataFrame = {
    val a = corpus.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = corpus.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val counts = broadcast(a).join(b, col("a_id") =!= col("b_id"))
      .filter(round(GraftFunctions.cosine(col("a_emb"), col("b_emb")), 6) >= tau)
      .groupBy(col("b_id")).agg(count(lit(1)).as("density"))
    keepByDensity(corpus, counts, floor)
  }

  /** [[densityPruneExact]] with LSH-bucketed neighbor counting —
    * cost ∝ Σ bucket², never corpus². Densities are one-sided
    * undercounts (see above), so the kept set ⊇ the exact kept set.
    */
  def densityPruneLsh(corpus: DataFrame, tau: Double, floor: Int = 5,
                      nTables: Int = 8, nBits: Int = 6): DataFrame = {
    val pairs = cosineNearDups(corpus, tau, nTables, nBits)
    val counts = pairs.select(col("vec_a").as("b_id"))
      .unionByName(pairs.select(col("vec_b").as("b_id")))
      .groupBy(col("b_id")).agg(count(lit(1)).as("density"))
    keepByDensity(corpus, counts, floor)
  }

  private def keepByDensity(corpus: DataFrame, counts: DataFrame,
                            floor: Int): DataFrame =
    corpus.join(counts, corpus("vec_id") === counts("b_id"), "left")
      .select(col("vec_id"),
        coalesce(col("density"), lit(0L)).as("density"))
      // md5-derived uniform in [0,1): first 6 hex chars / 2^24 — the
      // deterministic sampling primitive shared with the split family
      .withColumn("__u",
        conv(substring(md5(concat(lit("dp:"),
          col("vec_id").cast("string"))), 1, 6), 16, 10)
          .cast("long").cast("double") / lit(16777216.0))
      .select(col("vec_id"), col("density"),
        when(col("density") <= floor ||
          col("__u") < lit(floor.toDouble) / col("density"), "keep")
          .otherwise("prune").as("verdict"))
}
