package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{Selection, TextAnalysis}

/** COMPOSED streaming curation — the q136 chain as ONE foreachBatch
  * pass: NFC normalize → model-free quality gate → exact dedup
  * (keep-first across ALL batches seen so far, via a generational
  * hash index) → benchmark decontamination → token-budget selection
  * (global across batches, via a ledger) — emitting ONE VERDICT
  * COLUMN per document. This is the pipeline a real collection runs:
  * q136 is its nightly-batch audit, QualityGate / DedupStream /
  * BudgetGate are its single-stage streams; this composes the stages
  * so each arriving batch is curated in one pass with one trace row
  * per doc.
  *
  * Cross-batch state, both by the established disciplines:
  *  - HASH INDEX (`idx/gen=<batchId>`): each batch appends its
  *    per-hash min doc_id among quality survivors; probes merge all
  *    generations with min-of-mins (associative — the DedupStream
  *    contract) and EXCLUDE the probing batch's own generation, so a
  *    crash strictly between the output and index writes cannot make
  *    the replay flag every doc as a duplicate of itself.
  *  - LEDGER (`ledger/batch=<batchId>`): one row per batch recording
  *    the batch's budget-ELIGIBLE tokens (survivors of quality +
  *    dedup + decontam — kept AND budget-dropped alike) plus the
  *    admitted spend, read back FROM THE COMMITTED OUTPUT so the
  *    ledger can never record tokens the lake doesn't hold. Charging
  *    the budget with ELIGIBLE (not admitted) tokens makes the
  *    streamed selection EXACTLY the maximal global prefix of the
  *    arrival order — bit-equal to one batch `budgetSelect` over the
  *    union (the q136 semantics); BudgetGate's admitted-only ledger
  *    is the other policy (admission control that back-fills), kept
  *    there.
  *
  * Exactly-once: all three writes land in per-batch overwrite
  * partitions; the ledger reads strictly-earlier batches; the index
  * probe excludes the probing batch's generation. A replay after a
  * crash at ANY point rewrites its own partitions idempotently —
  * ScaleSpec replays the chain over a planted crashed generation and
  * asserts verdict parity with the one-shot batch golden.
  *
  * Per-batch cost shape (round 17, after the 2M stress attribution):
  * each batch pays ONE columnar scan + min-groupBy of the prior hash
  * index (O(lake keys) — irreducible for a hash-keyed index: uniform
  * keys defeat file pruning, so "delta cost" means one narrow scan,
  * not zero scan) plus O(batch) work in the four gates. The r16
  * harness measured per-batch time GROWING superlinearly at 2M docs;
  * the cause was multi-consumer recompute, not the index: the dup /
  * contam / budget frames each fan into 2-3 downstream joins, and
  * un-persisted, every consumer re-evaluated its whole upstream chain
  * INCLUDING the index scan — batch k paid ~4 × O(k) instead of
  * O(k). The stage hook now pins each gate once (persist + force),
  * and [[run]] materializes the probe side once per batch; the
  * remaining per-batch growth is the single index scan's linear term.
  *
  * Verdict parity caveat (documented contract): per-doc verdicts
  * equal the one-shot batch chain when arrival order refines the
  * admission ranking (here: doc_id — batches must arrive in doc_id
  * order for budget parity; quality/dup/contam verdicts need only
  * keep-first consistency, i.e. earlier batches hold smaller ids).
  * An arrival order that contradicts the ranking is the offline
  * planner's problem, not the stream's.
  */
object CurationStream {

  /** Idempotent init for the two state dirs: a zero ledger sentinel
    * and an empty hash-index generation, so the first batch's reads
    * find valid parquet tables.
    */
  def init(spark: SparkSession, indexDir: String, ledgerDir: String): Unit = {
    spark.range(1)
      .select(lit(0L).as("eligible"), lit(0L).as("spent"))
      .write.mode("overwrite").parquet(s"$ledgerDir/batch=-1")
    spark.range(0)
      .select(lit("").as("th"), lit(0L).as("keep_id"))
      .write.mode("overwrite").parquet(s"$indexDir/gen=seed")
  }

  /** The one-pass verdict chain for a single batch, against the prior
    * cross-batch state. Shared verbatim by the stream (per batch) and
    * by ScaleSpec's one-shot golden (whole union, empty prior) — the
    * replay test then exercises exactly the cross-batch machinery:
    * index merge, ledger, crash idempotence.
    *
    * @param priorHashes   (th, keep_id) minima from all PRIOR batches
    * @param priorEligible Σ budget-eligible tokens of prior batches
    * @param stage         per-stage hook: the stream passes a
    *                      persist-force-and-time wrapper so each gate
    *                      materializes ONCE (its frame is consumed by
    *                      2-3 downstream joins — unhooked, every
    *                      consumer re-evaluated the whole upstream
    *                      chain INCLUDING the cross-batch index scan,
    *                      which is what made per-batch cost grow
    *                      superlinearly at 2M docs: batch k paid
    *                      O(k·index) instead of O(index)); the
    *                      one-shot golden keeps the identity default
    *                      — verdicts are hook-invariant
    * @return (verdicts: doc_id, verdict, ws_tokens, dup_of,
    *         cum_global; batchMinima: th, keep_id)
    */
  private[graft] def verdictChain(batch: DataFrame, benchmark: DataFrame,
                                  priorHashes: DataFrame, priorEligible: Long,
                                  budget: Long, contamN: Int,
                                  stage: (String, DataFrame) => DataFrame =
                                    (_, df) => df): (DataFrame, DataFrame) = {
    val normed = batch
      .select(col("doc_id"), GraftFunctions.nfc(col("text")).as("text"))
    val qual = stage("quality",
      TextAnalysis.qualityScore(normed, "doc_id", "text")
        .select(col("doc_id"), col("keep"),
          col("n_words").cast("long").as("ws_tokens")))
    val survivors1 = normed
      .join(qual.filter(col("keep") === 1).select("doc_id"), "doc_id")
    val hashes = survivors1
      .select(col("doc_id"),
        md5(array_join(GraftFunctions.normWords(col("text")), " ")).as("th"))
    val batchMin = hashes.groupBy(col("th"))
      .agg(min(col("doc_id")).as("bmin"))
    // keep-first across everything seen so far: min(prior, batch)
    val keepIdByHash = batchMin
      .join(priorHashes.select(col("th"), col("keep_id").as("pmin")),
        Seq("th"), "left")
      .select(col("th"),
        least(coalesce(col("pmin"), col("bmin")), col("bmin")).as("keep_id"))
    val dup = stage("dedup_probe",
      hashes.join(keepIdByHash, "th")
        .filter(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id"), col("keep_id").as("dup_of")))
    val contam = stage("decontam",
      TextAnalysis.contamination(
          survivors1.join(dup.select("doc_id"), Seq("doc_id"), "left_anti"),
          benchmark, "doc_id", "text", n = contamN)
        .select(col("doc_id"), lit(1).as("iscont")))
    val s3 = qual.filter(col("keep") === 1)
      .select(col("doc_id"), col("ws_tokens"))
      .join(dup.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(contam.select("doc_id"), Seq("doc_id"), "left_anti")
    val kept = stage("budget_prefix_sum",
      Selection.budgetSelect(s3, Seq(col("doc_id").asc),
          col("ws_tokens"), math.max(0L, budget - priorEligible))
        .select(col("doc_id"),
          (col("cum_weight") + lit(priorEligible)).as("cum_global")))
    val verdicts = normed.select(col("doc_id"))
      .join(qual.select(col("doc_id"), col("keep"), col("ws_tokens")),
        Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("keep") === 0, "quality")
          .when(col("dup_of").isNotNull, "dup")
          .when(col("iscont") === 1, "contam")
          .when(col("cum_global").isNotNull, "kept")
          .otherwise("budget").as("verdict"),
        col("ws_tokens"), col("dup_of"), col("cum_global"))
    (verdicts, batchMin.select(col("th"), col("bmin").as("keep_id")))
  }

  /** Drive the composed curation over the files currently in the
    * source (AvailableNow — the replay/test harness shape; production
    * leaves the query running). `docs` must carry (doc_id, text);
    * call [[init]] once before the first run.
    */
  def run(docs: DataFrame, benchmark: DataFrame, indexDir: String,
          ledgerDir: String, outDir: String, checkpointDir: String,
          budget: Long, contamN: Int = 8,
          onStage: (Long, String, Double) => Unit = (_, _, _) => ()): Unit = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        val sp = batch.sparkSession
        val cached = batch.persist()
        // every per-stage persist (probe side + the four gates)
        // releases at batch end — state never leaks across batches
        try graft.Caching.CacheScope.withScope {
          import graft.Caching.ScopedPersist
          def timed[A](name: String)(f: => A): A = {
            val t0 = System.nanoTime()
            val r = f
            onStage(batchId, name, (System.nanoTime() - t0) / 1e9)
            r
          }
          // a stage hook that pins each gate's frame: persist + force,
          // so its 2-3 downstream consumers reuse ONE materialization
          // instead of re-running the gate (and, transitively, the
          // whole cross-batch index scan) per consumer
          def stage(name: String, df: DataFrame): DataFrame = timed(name) {
            val p = df.scopedPersist(); p.count(); p
          }
          // prior state, crash-safely scoped: ledger strictly earlier,
          // index excluding this batch's own (possibly half-committed)
          // generation — the DedupStream replay discipline
          val priorEligible = timed("ledger_read") {
            sp.read.parquet(ledgerDir)
              .filter(col("batch") < batchId)
              .agg(coalesce(sum(col("eligible")), lit(0L))).first().getLong(0)
          }
          // the probe side, materialized ONCE per batch: one columnar
          // scan of (th, keep_id) + one min groupBy — O(index), the
          // irreducible per-batch term (hash keys are uniform, so no
          // file pruning can shrink the scan; at cluster scale the
          // index would be hash-bucketed on th and this becomes a
          // co-partitioned join, same single-scan cost)
          val priorHashes = timed("index_probe") {
            val p = sp.read.parquet(indexDir)
              .filter(col("gen").cast("string") =!= lit(batchId.toString))
              .groupBy(col("th")).agg(min(col("keep_id")).as("keep_id"))
              .scopedPersist()
            p.count(); p
          }
          val (verdicts, batchMin) = verdictChain(cached.toDF(), benchmark,
            priorHashes, priorEligible, budget, contamN, stage)
          timed("verdict_write") {
            verdicts.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
          }
          // ledger from the COMMITTED output: eligible = kept + budget
          // rows (survived every content gate), spent = kept only
          timed("ledger_index_write") {
            val committed = sp.read.parquet(s"$outDir/batch=$batchId")
            val led = committed
              .agg(coalesce(sum(when(col("verdict").isin("kept", "budget"),
                  col("ws_tokens"))), lit(0L)).as("eligible"),
                coalesce(sum(when(col("verdict") === "kept",
                  col("ws_tokens"))), lit(0L)).as("spent"))
              .first()
            sp.range(1)
              .select(lit(led.getLong(0)).as("eligible"), lit(led.getLong(1)).as("spent"))
              .write.mode("overwrite").parquet(s"$ledgerDir/batch=$batchId")
            batchMin.write.mode("overwrite").parquet(s"$indexDir/gen=$batchId")
          }
        } finally cached.unpersist(blocking = false)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }
}
