package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.Caching.ScopedPersist

/** SURVEY.md §2.3 round-3 — retrieval/serving-side operators over the
  * curated corpus: fixed-window chunking (the context-window prep
  * step), deterministic global shuffle into shards (training-order
  * randomization that is reproducible under any partitioning),
  * a skew-guarded inverted index, and BM25 ranking.
  *
  * Reference behavior being generalized: the reference's tidy scripts
  * materialize per-entity long tables and deterministic orderings
  * (reference/scripts/tidy/temp-tidy-all-api-ftp-files.R); these are
  * the same shapes applied to the training-corpus domain.
  */
object Retrieval {

  /** Fixed-size token-window chunking with overlap — split each doc's
    * normalized words into `width`-token windows every `stride`
    * tokens (trailing partial window kept). Entirely narrow: one
    * array transform + posexplode per doc, no shuffle at any scale.
    * Chunk text is emitted as an md5 so downstream compares stay
    * fixed-width (the real pipeline would keep the token slice).
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     width: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && width >= stride, s"need 0 < stride <= width, got $width/$stride")
    docs
      .select(col(idCol).as("doc_id"),
        GraftFunctions.normWords(col(textCol)).as("__ws"))
      .scopedPersist() // lambda barrier — see Dedup.docShingles
      .filter(size(col("__ws")) >= 1)
      .select(col("doc_id"),
        expr(s"transform(sequence(0, (size(__ws) - 1) div $stride), " +
          s"c -> slice(__ws, c * $stride + 1, $width))").as("__chunks"))
      .select(col("doc_id"), posexplode(col("__chunks")).as(Seq("chunk_idx", "__chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        md5(array_join(col("__chunk"), " ")).as("chunk_hash"))
  }

  /** Deterministic global shuffle: every row gets a content-independent
    * pseudo-random shard (first 32 bits of a salted md5, mod nShards)
    * and a position within its shard. Reproducible under any input
    * partitioning — no rand(), no zipWithIndex. At 100 TB this is ONE
    * hash-partition exchange + a per-shard local sort; no global sort.
    * Deriving the shard from 32 hash bits (not one nibble) keeps the
    * modulo bias below nShards/2^32 for ANY shard count, so shards are
    * uniform and the per-shard row_number window never sees skew.
    */
  def shuffleIntoShards(df: DataFrame, idCol: String, salt: String,
                        nShards: Int = 16): DataFrame = {
    require(nShards >= 1 && nShards <= 65536, "supports 1..65536 shards")
    val h = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    // first 8 hex chars of the hash (0..2^32-1); the oracle derives the
    // same value via a positional strpos('0123456789abcdef', ...) sum
    val shard = conv(substring(h, 1, 8), 16, 10).cast("long") % nShards
    val withKey = df.select(col(idCol).as("doc_id"), h.as("__h"),
      shard.cast("long").as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col("doc_id"))
    withKey.select(col("shard"), row_number().over(w).cast("long").as("pos"),
      col("doc_id"))
  }

  /** Inverted index with a hot-key (stopword) guard: word → document
    * frequency + a comma-joined sorted postings list, where postings
    * are only materialized for words with df <= `postingCap`. The
    * guard is structural, not cosmetic: df is counted first (map-side
    * combinable count, no lists), the over-cap words — the tiny
    * stopword set — are anti-joined out BEFORE collect_list runs, so
    * no aggregation buffer ever holds a boilerplate word's full
    * posting list. At 100 TB the collect side is bounded by
    * postingCap × word count; the df side is a plain combinable count.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    postingCap: Int = 100): DataFrame = {
    val pairs = docs
      .select(col(idCol).as("doc_id"),
        GraftFunctions.normWords(col(textCol)).as("__ws"))
      .scopedPersist() // lambda barrier + two consumers (df pass, postings pass)
      .select(col("doc_id"), explode(array_distinct(col("__ws"))).as("word"))
    val dfs = pairs.groupBy(col("word")).agg(count(lit(1)).as("df")).scopedPersist()
    val hot = dfs.filter(col("df") > postingCap).select(col("word"))
    val postings = pairs
      .join(broadcast(hot), Seq("word"), "left_anti")
      .groupBy(col("word"))
      .agg(expr("array_join(transform(sort_array(collect_list(doc_id)), x -> cast(x AS string)), ',')")
        .as("postings"))
    dfs.join(postings, Seq("word"), "left")
      .select(col("word"), col("df"), col("postings"))
  }

  /** BM25 (Robertson/Spärck Jones) ranking of the corpus against a
    * fixed term list. One aggregation pass computes the global stats
    * (N, avgdl, per-term document frequencies — a single row), which
    * broadcasts; scoring is then a narrow codegen'd pass over the
    * corpus. Two jobs total at any scale, no per-term shuffle.
    * Scores are rounded to 6 dp (engine-robust double repr).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
               topK: Int = 20): DataFrame = {
    require(terms.nonEmpty && terms.size <= 8, "supply 1..8 query terms")
    val ws = docs
      .select(col(idCol).as("doc_id"),
        GraftFunctions.normWords(col(textCol)).as("__ws"))
      .scopedPersist() // lambda barrier + two consumers (stats, scoring)
    // avgdl from an EXACT integer token-count sum (order-independent),
    // divided once — never a float avg(), whose partial-sum order
    // would make the score partitioning-dependent.
    val statCols =
      count(lit(1)).cast("double").as("n_docs") +:
        (sum(size(col("__ws")).cast("long")).cast("double") / count(lit(1))).as("avgdl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(array_contains(col("__ws"), t).cast("long")).cast("double").as(s"df_$i")
        }
    val stats = ws.agg(statCols.head, statCols.tail: _*)
    val dl = size(col("__ws")).cast("double")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("__ws"), w => w === t)).cast("double")
      val idf = log((col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / col("avgdl")))
    }.reduce(_ + _)
    ws.crossJoin(broadcast(stats)) // 1-row stats — broadcast-nested-loop
      .select(col("doc_id"), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Eval-set contract, enforced (round 10, made LAZY in round 11):
    * the rank-based eval ops (q144 retrieval eval, q177 graded nDCG)
    * fan the query set out against corpus shingles and window per
    * query — legitimate ONLY while the query set is eval-sized.
    *
    * Round 10 counted eagerly at plan construction; that ran a Spark
    * job for EVERY plan built (the plan-audit suites build all ~193,
    * some under both AQE modes) while guarding a set the caller had
    * already hard-bounded — all cost, no protection. Now the guard
    * rides INSIDE the returned plan: a broadcast 1-row count branch
    * whose filter raises iff the contract is violated, evaluated
    * with the query itself. Plan construction is free, and the check
    * fires wherever the plan actually executes — including a caller
    * who skipped the bounding filter.
    *
    * CONTRACT: `df` must be DETERMINISTIC (re-evaluating its plan
    * yields the same rows). The guard's count branch re-executes the
    * subplan, so a non-deterministic frame (an unseeded random sample,
    * an unpersisted rand() filter) could count different rows than the
    * main lineage processes and let an oversized set through. All
    * in-repo callers pass deterministic frames; a caller with a
    * non-deterministic source must persist/checkpoint it first.
    */
  def requireEvalBounded(df: DataFrame, maxRows: Long, what: String): DataFrame = {
    val msg = s"$what exceeds the $maxRows-row eval-set contract " +
      "(rank-based evaluation over an unbounded set is a scale hazard — " +
      "take a deterministic sample first); rows: "
    val guard = df
      .select(count(lit(1)).as("__n"))
      .where(coalesce( // raise_error is non-foldable: the filter survives
        when(col("__n") > maxRows, raise_error(concat(lit(msg), col("__n")))),
        lit(true)))
      .select(lit(1).as("__eval_bounded"))
    df.crossJoin(broadcast(guard)).drop("__eval_bounded")
  }
}
