package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Caching
import graft.Caching.LoopCheckpoint
import graft.functions.GraftFunctions

/** SURVEY.md §2.3 — distributed BPE tokenizer-vocabulary learning
  * (Sennrich et al. 2016, arXiv:1508.07909: byte-pair encoding over a
  * word-frequency table).
  *
  * Scale shape: the corpus is read ONCE — one partial-agg groupBy
  * collapses it to a (word, freq) table, which is vocab-bounded
  * (≪ corpus at 100 TB; the statistics of BPE depend only on word
  * frequencies, not occurrences). Every learning round then runs on
  * that small table: adjacent-pair explode → one uniform-key count →
  * global top-1 (TakeOrdered, deterministic tie-break on the pair) →
  * the winning pair broadcasts back into a narrow fold that rewrites
  * each word's symbol sequence. No driver-side collect anywhere in
  * the loop; per-round localCheckpoint with superseded-block release
  * caps lineage exactly as the PageRank/BFS loops do.
  *
  * The merge fold is greedy left-to-right, the standard BPE
  * application order: "aaa" under merge (a,a) becomes ["aa","a"],
  * because the freshly merged symbol never re-merges with the next
  * input symbol in the same round.
  */
object Bpe {

  /** One round's rewrite: fold `seq`, merging adjacent (`__l`,`__r`)
    * into their concatenation. Nested CASE keeps `element_at(acc,-1)`
    * unevaluated on empty accumulators (ANSI mode errors on
    * out-of-bounds, and AND is not guaranteed to short-circuit).
    */
  private val applyMergeSql: String =
    "aggregate(seq, CAST(array() AS ARRAY<STRING>), (acc, x) -> " +
      "CASE WHEN size(acc) = 0 THEN array(x) " +
      "WHEN element_at(acc, -1) = __l AND x = __r " +
      "THEN concat(slice(acc, 1, size(acc) - 1), array(concat(__l, __r))) " +
      "ELSE concat(acc, array(x)) END)"

  /** Learn `k` merges over `docs(textCol)`. Returns one row per merge:
    * (rank, left, right, merged, pair_freq), rank 1..k in learning
    * order — the tokenizer-model artifact a pipeline ships.
    */
  def learnMerges(docs: DataFrame, textCol: String, k: Int,
                  ckptEvery: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var words = docs
      .select(explode(GraftFunctions.normWords(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(expr("filter(split(word, ''), c -> c <> '')").as("seq"),
        col("freq"))
      .loopCheckpoint() // vocab-bounded; the corpus is never reread
    var superseded = List.empty[DataFrame]
    var merges = List.empty[DataFrame]
    for (r <- 1 to k) {
      val best = words.filter(size(col("seq")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(seq)-2), " +
            "i -> named_struct('l', seq[i], 'r', seq[i+1]))")).as("p"))
        .groupBy(col("p.l").as("left"), col("p.r").as("right"))
        .agg(sum(col("freq")).as("pair_freq"))
        .orderBy(col("pair_freq").desc, col("left"), col("right"))
        .limit(1)
        .select(lit(r).as("rank"), col("left"), col("right"),
          concat(col("left"), col("right")).as("merged"), col("pair_freq"))
        .loopCheckpoint() // 1 row; pins this round's winner
      merges ::= best
      val eager = r % ckptEvery == 0 || r == k
      val next = words
        .crossJoin(broadcast(
          best.select(col("left").as("__l"), col("right").as("__r"))))
        .select(expr(applyMergeSql).as("seq"), col("freq"))
        .loopCheckpoint(eager)
      superseded ::= words // incl. round 1: the initial table is ours
      if (eager) {
        superseded.foreach(Caching.releaseCheckpoint)
        superseded = Nil
      }
      words = next
    }
    // merge rows are their own (eager) checkpoints — the final word
    // table's blocks are not part of the result
    Caching.releaseCheckpoint(words)
    merges.reverse.reduce(_ unionByName _)
  }

  /** Tokenize `textCol` with a learned merge table: per-word symbol
    * sequences folded through the merges in rank order. The merge
    * table is a model artifact (k rows, like the classifier's weight
    * vector) — it rides into the plan as k nested narrow folds, so
    * tokenization is one pass over the corpus, no joins, no shuffle.
    * Returns (original columns..., tokens: array<string>).
    */
  def applyMerges(docs: DataFrame, textCol: String, merges: DataFrame): DataFrame = {
    val ordered = merges.select(col("rank"), col("left"), col("right"))
      .collect().sortBy(_.getInt(0))
    def esc(s: String): String = s.replace("\\", "\\\\").replace("'", "\\'")
    // innermost: one word's char sequence; each merge wraps one fold.
    // Lambda variable names are unique per nesting level (a0/x0, …) —
    // Catalyst resolves lambda variables lexically and same-name
    // shadowing across levels is rejected.
    var e = "filter(split(w, ''), c -> c <> '')"
    ordered.zipWithIndex.foreach { case (row, i) =>
      val l = esc(row.getString(1)); val r = esc(row.getString(2))
      e = s"aggregate($e, CAST(array() AS ARRAY<STRING>), (a$i, x$i) -> " +
        s"CASE WHEN size(a$i) = 0 THEN array(x$i) " +
        s"WHEN element_at(a$i, -1) = '$l' AND x$i = '$r' " +
        s"THEN concat(slice(a$i, 1, size(a$i) - 1), array(concat('$l', '$r'))) " +
        s"ELSE concat(a$i, array(x$i)) END)"
    }
    docs
      .withColumn("__ws", GraftFunctions.normWords(col(textCol)))
      .withColumn("tokens", expr(s"flatten(transform(__ws, w -> $e))"))
      .drop("__ws")
  }
}
