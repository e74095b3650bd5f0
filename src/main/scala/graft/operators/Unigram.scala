package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Caching
import graft.Caching.LoopCheckpoint
import graft.functions.GraftFunctions

/** SURVEY.md §2.3 — UNIGRAM-LM (SentencePiece) tokenizer-vocabulary
  * learning (Kudo '18, arXiv:1804.10959): the second mainstream
  * subword learner next to BPE ([[Bpe]]). Where BPE greedily MERGES,
  * the unigram LM starts from a large seed vocabulary and PRUNES:
  * each piece carries a probability, a word's segmentation is the
  * Viterbi-best piece sequence, and EM alternates (E) re-segmenting
  * the corpus under the current probabilities with (M) re-estimating
  * probabilities from the segmentation counts, shrinking the
  * vocabulary toward a target size between EM phases.
  *
  * Scale shape — the [[Bpe]] discipline exactly:
  *  - the corpus is read ONCE and collapsed to a (word, freq) table
  *    by one partial-agg groupBy (unigram-LM statistics depend only
  *    on word frequencies, never on occurrences), loopCheckpoint'ed;
  *  - the vocabulary is DataFrame-resident for the whole learn loop.
  *    Each E-step ships it into the row kernel as a 1-row
  *    `map<piece,cost>` frame via crossJoin(broadcast(…)) — NO
  *    driver-side collect anywhere;
  *  - Viterbi DP and its backtrace are per-row `aggregate` folds over
  *    the word's positions (codegen-free HOFs but narrow: zero
  *    shuffle). The only per-iteration shuffle is the piece-count
  *    groupBy on the uniform piece key — vocab-bounded, ≪ corpus;
  *  - per-round loopCheckpoint + superseded-block release caps
  *    lineage exactly as the BPE/PageRank loops do.
  *
  * Determinism contract: seed selection, EM updates and pruning all
  * tie-break on (count desc, piece asc); the DP backtrace ties to the
  * SMALLEST start index (= the longest piece, the SentencePiece
  * convention). Same corpus → bit-identical vocabulary.
  *
  * Hard-EM monotonicity (the spec invariant): with the vocabulary
  * support FIXED, each (E, M) round cannot increase the corpus
  * Viterbi NLL — the M-step is the exact MLE of the E-step's
  * segmentation, so NLL(seg_t, θ_{t+1}) ≤ NLL(seg_t, θ_t), and the
  * next Viterbi pass only improves on seg_t. Zero-count single chars
  * are retained at a FLOOR cost ln(2·total) (> any used piece's
  * cost) — they never enter a Viterbi path while unused, so the
  * monotone argument is untouched, but coverage of every seen
  * character survives pruning (the SentencePiece guarantee).
  */
object Unigram {

  /** Viterbi DP over one word: best(j) = min cost of segmenting the
    * first j chars; pieces up to `maxLen` chars looked up in the
    * broadcast map column `__vm` (cost = −ln p). Unknown pieces cost
    * 1e15 — effectively +∞, but single chars from the corpus are
    * always present so every word stays finite. 1-indexed
    * element_at/substring throughout.
    */
  private def bestExpr(maxLen: Int, sfx: String = ""): String =
    // lambda names carry a suffix so [[segment]] can inline this
    // under piecesExpr's own `i ->` lambda — Catalyst rejects
    // same-name shadowing across nesting levels (the Bpe rule)
    s"""aggregate(sequence(1, length(w)), array(CAST(0.0 AS DOUBLE)),
       |  (acc$sfx, j$sfx) -> concat(acc$sfx, array(array_min(transform(
       |    sequence(greatest(0, j$sfx - $maxLen), j$sfx - 1),
       |    i$sfx -> element_at(acc$sfx, i$sfx + 1) +
       |      coalesce(element_at(__vm, substring(w, i$sfx + 1, j$sfx - i$sfx)),
       |               CAST(1e15 AS DOUBLE)))))))""".stripMargin.replace("\n", " ")

  /** Backtrace the DP table `__best`: walk positions right-to-left,
    * at each stop re-deriving the argmin start index (FIRST index
    * achieving the min — array_position — so ties go to the longest
    * piece, deterministically). At most length(w) hops, so one fold
    * over sequence(1, length(w)) with a (pos, pieces) accumulator
    * suffices; exhausted states (pos = 0) pass through.
    */
  private def piecesExpr(maxLen: Int): String = {
    def istar(pos: String): String =
      s"""element_at(sequence(greatest(0, $pos - $maxLen), $pos - 1),
         |  CAST(array_position(
         |    transform(sequence(greatest(0, $pos - $maxLen), $pos - 1),
         |      i -> element_at(__best, i + 1) +
         |        coalesce(element_at(__vm, substring(w, i + 1, $pos - i)),
         |                 CAST(1e15 AS DOUBLE))),
         |    array_min(
         |    transform(sequence(greatest(0, $pos - $maxLen), $pos - 1),
         |      i -> element_at(__best, i + 1) +
         |        coalesce(element_at(__vm, substring(w, i + 1, $pos - i)),
         |                 CAST(1e15 AS DOUBLE))))) AS INT))""".stripMargin
    s"""aggregate(sequence(1, length(w)),
       |  named_struct('pos', length(w), 'ps', CAST(array() AS ARRAY<STRING>)),
       |  (st, z) -> CASE WHEN st.pos <= 0 THEN st ELSE named_struct(
       |    'pos', ${istar("st.pos")},
       |    'ps', concat(array(substring(w, ${istar("st.pos")} + 1,
       |                       st.pos - ${istar("st.pos")})), st.ps)) END,
       |  st -> st.ps)""".stripMargin.replace("\n", " ")
  }

  /** The 1-row broadcastable (piece → cost) map frame. collect_list
    * order is plan-dependent but map LOOKUP is order-independent and
    * keys are unique, so the kernel is deterministic.
    */
  private def vmRow(vocab: DataFrame): DataFrame =
    broadcast(vocab.agg(
      map_from_entries(collect_list(struct(col("piece"), col("cost"))))
        .as("__vm")))

  /** E-step + M-step: Viterbi-segment every distinct word under
    * `vocab`, count pieces weighted by word freq (ONE uniform-key
    * groupBy), and return the re-estimated (piece, cnt, cost) table —
    * used pieces at exact MLE cost ln(total) − ln(cnt), unused single
    * chars at the floor cost ln(2·total), unused multi-char pieces
    * dropped (hard-EM semantics).
    */
  private def emRound(words: DataFrame, vocab: DataFrame,
                      maxLen: Int): DataFrame = {
    val counts = words.crossJoin(vmRow(vocab))
      .withColumn("__best", expr(bestExpr(maxLen)))
      .select(col("freq"), explode(expr(piecesExpr(maxLen))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__tot"))
    vocab.select(col("piece")).join(counts, Seq("piece"), "left")
      .filter(col("cnt").isNotNull || length(col("piece")) === 1)
      .crossJoin(broadcast(tot))
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"),
        when(col("cnt").isNotNull,
          log(col("__tot").cast("double")) - log(col("cnt").cast("double")))
          .otherwise(log(lit(2.0) * col("__tot"))).as("cost"))
  }

  /** Corpus Viterbi NLL under `vocab`: Σ_w freq·best(|w|), each word's
    * contribution quantized to DECIMAL(20,10) before the global sum
    * (exact, partition-order-independent — the q101 discipline).
    */
  private def corpusNll(words: DataFrame, vocab: DataFrame,
                        maxLen: Int): DataFrame =
    words.crossJoin(vmRow(vocab))
      .select((col("freq").cast("double") *
        element_at(expr(bestExpr(maxLen)), length(col("w")) + 1))
        .cast(DecimalType(20, 10)).as("__nll"))
      .agg(sum(col("__nll")).cast("double").as("corpus_nll"))

  /** Collapse `docs(textCol)` to the training (w, freq) table. Words
    * longer than 24 chars are excluded from TRAINING (the
    * SentencePiece too-long-sentence skip; [[segment]] still handles
    * them — unknown pieces fall back to per-char costs).
    */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(GraftFunctions.normWords(col(textCol))).as("w"))
      .filter(length(col("w")) <= 24)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Seed vocabulary: every substring of length 2..`maxLen` of every
    * distinct word, scored by Σ freq of containing words (counting
    * multiplicity of positions), top `seedSize` by (score desc, piece
    * asc) — plus ALL single characters, which are never pruned.
    * Initial costs are the MLE over the seed scores.
    */
  private def seedVocab(words: DataFrame, seedSize: Int,
                        maxLen: Int): DataFrame = {
    // (piece, declared length) pairs; substring() truncates at the
    // word end, so keep only full-length pieces (no tail duplicates)
    val subs = words
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(w)),
           |  i -> transform(sequence(0, ${maxLen - 2}),
           |    k -> named_struct('p', substring(w, i, k + 2), 'n', k + 2))))"""
          .stripMargin.replace("\n", " "))).as("s"))
      .filter(length(col("s.p")) === col("s.n"))
      .groupBy(col("s.p").as("piece")).agg(sum(col("freq")).as("cnt"))
    val multi = subs
      .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
    val chars = words
      .select(col("freq"), explode(split(col("w"), "")).as("piece"))
      .filter(col("piece") =!= "")
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val all = multi.unionByName(chars)
    val tot = all.agg(sum(col("cnt")).as("__tot"))
    all.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        (log(col("__tot").cast("double")) -
          log(col("cnt").cast("double"))).as("cost"))
  }

  /** Prune to `keep` multi-char pieces by (cnt desc, piece asc);
    * single chars always survive. The window is vocab-bounded
    * (seed-size rows — metadata, the audited bounded-domain pattern).
    */
  private def prune(vocab: DataFrame, keep: Int): DataFrame = {
    val multi = vocab.filter(length(col("piece")) > 1)
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("piece"))))
      .filter(col("__rk") <= keep).drop("__rk")
    multi.unionByName(vocab.filter(length(col("piece")) === 1))
  }

  /** Learn a unigram-LM vocabulary: seed → EM ×`emIters` → prune to
    * `vocabSize` multi-char pieces → EM ×`emIters` (the SentencePiece
    * shrink loop with one shrink stage — enough to exercise every
    * phase; more stages are the same loop body). Returns
    * (rank, piece, cnt, logprob) in (cnt desc, piece) order, single
    * chars included (rank over the final vocab — bounded window).
    */
  def learnVocab(docs: DataFrame, textCol: String, vocabSize: Int,
                 emIters: Int = 2, maxPieceLen: Int = 6,
                 seedSize: Int = 0): DataFrame =
    learnImpl(docs, textCol, vocabSize, emIters, maxPieceLen,
      seedSize, withTrace = false)._1

  /** [[learnVocab]] plus the per-phase EM trace
    * (step, phase, vocab_size, corpus_nll) — the monotone-likelihood
    * evidence the spec asserts on (NLL non-increasing within each
    * fixed-support EM phase). The trace rows are the caller's
    * checkpoints to release (the one-table contract, ×2).
    */
  def learnVocabWithTrace(docs: DataFrame, textCol: String, vocabSize: Int,
                          emIters: Int = 2, maxPieceLen: Int = 6,
                          seedSize: Int = 0): (DataFrame, DataFrame) = {
    val (out, trace) = learnImpl(docs, textCol, vocabSize, emIters,
      maxPieceLen, seedSize, withTrace = true)
    (out, trace.get)
  }

  /** Block-lifetime contract (PersistSweep): with `withTrace = false`
    * no snapshot checkpoints are ever created; every superseded vocab
    * round — including the pre-prune table — is released as soon as
    * its successor materializes, and the ONLY surviving checkpoint is
    * the returned vocabulary (the caller releases it, as with the
    * CC/PageRank results).
    */
  private def learnImpl(docs: DataFrame, textCol: String, vocabSize: Int,
                        emIters: Int, maxPieceLen: Int,
                        seedSize: Int,
                        withTrace: Boolean): (DataFrame, Option[DataFrame]) = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    val seedN = if (seedSize > 0) seedSize else 4 * vocabSize
    val words = wordTable(docs, textCol).loopCheckpoint()
    var vocab = seedVocab(words, seedN, maxPieceLen).loopCheckpoint()
    var superseded = List.empty[DataFrame]
    var trace = List.empty[DataFrame]
    var step = 0
    def snap(phase: String): Unit = if (withTrace) {
      step += 1
      val vs = vocab.agg(count(lit(1)).as("vocab_size"))
      trace ::= corpusNll(words, vocab, maxPieceLen)
        .crossJoin(broadcast(vs))
        .select(lit(step).as("step"), lit(phase).as("phase"),
          col("vocab_size"), round(col("corpus_nll"), 6).as("corpus_nll"))
        .loopCheckpoint() // 1 row; released by the trace's consumer
    }
    def em(phase: String): Unit = for (_ <- 1 to emIters) {
      val next = emRound(words, vocab, maxPieceLen).loopCheckpoint()
      superseded ::= vocab
      superseded.foreach(Caching.releaseCheckpoint)
      superseded = Nil
      vocab = next
      snap(phase)
    }
    snap("seed")
    em("em1")
    val prePrune = vocab
    vocab = prune(vocab, vocabSize).loopCheckpoint()
    Caching.releaseCheckpoint(prePrune) // em1's final round, now superseded
    snap("prune")
    em("em2")
    // the vocabulary is bounded by construction (≤ vocabSize multi-
    // char pieces + the corpus alphabet); the limit materializes that
    // bound in the plan (TakeOrdered), so the global rank window is
    // provably over a collapsed input — the PlanAudit contract
    val out = vocab
      .orderBy(col("cnt").desc, col("piece")).limit(1 << 20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("piece"))))
      .select(col("rank"), col("piece"), col("cnt"),
        round(-col("cost"), 6).as("logprob"))
    Caching.releaseCheckpoint(words)
    (out,
      if (withTrace) Some(trace.reverse.reduce(_ unionByName _)) else None)
  }

  /** Tokenize `textCol` with a learned vocabulary: the same Viterbi
    * DP + backtrace, vocabulary shipped as the broadcast 1-row map —
    * one narrow pass over the corpus, no shuffle, no collect.
    * Characters unseen at train time fall back to the 1e15 unknown
    * cost (still segmentable — per-char). Returns original columns +
    * tokens: array<string>.
    */
  def segment(docs: DataFrame, textCol: String, vocab: DataFrame,
              maxPieceLen: Int = 6): DataFrame = {
    val vm = vmRow(vocab.select(col("piece"),
      (-col("logprob")).as("cost")))
    val withTok = docs
      .withColumn("__ws", GraftFunctions.normWords(col(textCol)))
      .crossJoin(vm)
    // per-word kernel reused via a transform over the word array:
    // inline the DP inside the backtrace by substituting __best
    // (suffixed lambda names — see bestExpr)
    val inner = piecesExpr(maxPieceLen)
      .replace("element_at(__best,",
        s"element_at(${bestExpr(maxPieceLen, "b")},")
    withTok
      .withColumn("tokens", expr(
        s"flatten(transform(__ws, w -> $inner))"))
      .drop("__ws", "__vm")
  }
}
