package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpecBase {

  // The Sennrich'16 worked example: low×5, lower×2, newest×6, widest×3.
  // Hand computation: pair counts round 1 → es 9, st 9 (tie broken
  // lexicographically: (e,s) < (s,t)), then (es,t) 9, then lo 7 / ow 7
  // tie → (l,o), then (lo,w) 7.
  private def corpus = {
    import spark.implicits._
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("learned merges match the hand-computed BPE on the classic corpus") {
    val m = Bpe.learnMerges(corpus, "text", k = 4)
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m.toSeq == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L)))
  }

  test("pair frequencies are non-increasing in rank") {
    val freqs = TextQueries_q119(spark, sf).orderBy(col("rank"))
      .select(col("pair_freq")).collect().map(_.getLong(0))
    assert(freqs.nonEmpty)
    freqs.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b, s"pair_freq rose $a -> $b: BPE max count must not increase")
    }
  }

  test("learning is deterministic") {
    val a = TextQueries_q119(spark, sf).collect().toSeq
    val b = TextQueries_q119(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("applying the merges tokenizes greedily left-to-right") {
    import spark.implicits._
    val merges = Bpe.learnMerges(corpus, "text", k = 4)
    val toks = Bpe.applyMerges(
      Seq((1L, "lowest low aaa")).toDF("doc_id", "text"), "text", merges)
      .select(col("tokens")).head().getSeq[String](0)
    // "lowest" -> low + est, "low" -> low; "aaa" has no learned merges
    assert(toks == Seq("low", "est", "low", "a", "a", "a"), s"got $toks")
  }

  test("tokenization with more merges never increases token count") {
    val docs = Tables.documents(spark, sf).limit(50)
    val m8 = graft.queries.TextQueries.queries("q119_bpe_vocab")(spark, sf)
    val m2 = m8.filter(col("rank") <= 2)
    val t8 = Bpe.applyMerges(docs, "text", m8)
      .agg(sum(size(col("tokens")))).head().getLong(0)
    val t2 = Bpe.applyMerges(docs, "text", m2)
      .agg(sum(size(col("tokens")))).head().getLong(0)
    assert(t8 <= t2, s"8 merges produced MORE tokens than 2 ($t8 > $t2)")
  }

  private def TextQueries_q119 =
    graft.queries.TextQueries.queries("q119_bpe_vocab")
}
