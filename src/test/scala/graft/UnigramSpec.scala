package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

class UnigramSpec extends SparkSpecBase {

  // Hand-computable corpus: ab ×10, abc ×5.
  // Seed (counts): ab 15, abc 5, bc 5 + chars a 15, b 15, c 5.
  // EM round 1 Viterbi: "ab" → [ab] (ln4 < 2·ln4), "abc" → [abc]
  // (ln12 < ln4+ln12 < 3·ln4) → counts ab 10, abc 5, chars unused
  // (floor-cost). Round 2 identical (converged). Prune keeps both
  // multi-char pieces; em2 reproduces the counts. Final MLE:
  // p(ab) = 10/15, p(abc) = 5/15, char floor = 1/(2·15).
  private def corpus = {
    import spark.implicits._
    val text = (Seq.fill(10)("ab") ++ Seq.fill(5)("abc")).mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("learned vocab matches the hand-computed unigram-LM on the worked example") {
    val v = Unigram.learnVocab(corpus, "text", vocabSize = 2, emIters = 2)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(v.map(t => (t._1, t._2)).toSeq ==
      Seq(("ab", 10L), ("abc", 5L), ("a", 0L), ("b", 0L), ("c", 0L)),
      s"got ${v.toSeq}")
    assert(math.abs(v(0)._3 - math.log(10.0 / 15.0)) < 1e-6)
    assert(math.abs(v(1)._3 - math.log(5.0 / 15.0)) < 1e-6)
    // retained zero-count chars sit at the floor logprob −ln(2·total)
    assert(math.abs(v(2)._3 + math.log(30.0)) < 1e-6)
  }

  test("corpus Viterbi NLL is non-increasing within each fixed-support EM phase") {
    val docs = Tables.documents(spark, sf)
    val (_, trace) =
      Unigram.learnVocabWithTrace(docs, "text", vocabSize = 24, emIters = 2)
    val rows = trace.orderBy(col("step")).collect()
      .map(r => (r.getString(1), r.getDouble(3)))
    assert(rows.map(_._1).toSeq ==
      Seq("seed", "em1", "em1", "prune", "em2", "em2"))
    // seed → em1 steps and prune → em2 steps: each EM round must not
    // increase the NLL (hard-EM monotonicity; pruning MAY increase it)
    def mono(nlls: Seq[Double]): Unit =
      nlls.sliding(2).foreach { case Seq(a, b) =>
        assert(b <= a + 1e-6, s"EM round raised the corpus NLL: $a -> $b")
      }
    mono(rows.take(3).map(_._2).toSeq)         // seed, em1, em1
    mono(rows.drop(3).map(_._2).toSeq)         // prune, em2, em2
  }

  test("every corpus character survives pruning (coverage guarantee)") {
    val docs = Tables.documents(spark, sf)
    val vocab = graft.queries.TextQueries.queries("q262_unigram_vocab")(spark, sf)
    val vocabChars = vocab.filter(length(col("piece")) === 1)
      .select(col("piece")).collect().map(_.getString(0)).toSet
    val corpusChars = docs
      .select(explode(graft.functions.GraftFunctions.normWords(col("text"))).as("w"))
      .select(explode(split(col("w"), "")).as("c"))
      .filter(col("c") =!= "").distinct()
      .collect().map(_.getString(0)).toSet
    assert(corpusChars.subsetOf(vocabChars),
      s"missing chars: ${corpusChars -- vocabChars}")
    // and the multi-char budget is respected
    val nMulti = vocab.filter(length(col("piece")) > 1).count()
    assert(nMulti <= 24, s"prune target exceeded: $nMulti multi-char pieces")
  }

  test("segmentation round-trips: concatenated tokens rebuild the words") {
    val docs = Tables.documents(spark, sf).limit(50)
    val vocab = graft.queries.TextQueries.queries("q262_unigram_vocab")(spark, sf)
    val bad = Unigram.segment(docs, "text", vocab)
      .select(col("doc_id"),
        array_join(col("tokens"), "").as("rebuilt"),
        array_join(graft.functions.GraftFunctions.normWords(col("text")), "")
          .as("orig"))
      .filter(col("rebuilt") =!= col("orig"))
      .count()
    assert(bad == 0, s"$bad docs failed the segmentation round-trip")
  }

  test("Viterbi ties break to the longest piece") {
    import spark.implicits._
    // p(xy) = p(x)·p(y) = 1/4 → the single-piece and two-piece
    // segmentations cost exactly the same; the backtrace must take
    // the longest piece (first argmin index)
    val vocab = Seq(("x", 1L, math.log(0.5)),
      ("y", 1L, math.log(0.5)), ("xy", 1L, math.log(0.25)))
      .toDF("piece", "cnt", "logprob")
    val toks = Unigram.segment(
      Seq((1L, "xy")).toDF("doc_id", "text"), "text", vocab)
      .select(col("tokens")).head().getSeq[String](0)
    assert(toks == Seq("xy"), s"got $toks")
  }

  test("learning is deterministic") {
    val q = graft.queries.TextQueries.queries("q262_unigram_vocab")
    val a = q(spark, sf).collect().toSeq
    val b = q(spark, sf).collect().toSeq
    assert(a == b)
  }
}
