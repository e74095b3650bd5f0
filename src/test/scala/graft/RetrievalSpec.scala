package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval
import graft.queries.RetrievalQueries

/** SURVEY §2.3 round-3 retrieval operators: chunking, shard shuffle,
  * inverted index, BM25.
  */
class RetrievalSpec extends SparkSpecBase {

  private def q(name: String) = RetrievalQueries.queries(name)(spark, sf)

  test("chunking covers every token: stride-spaced starts, full-width interior chunks") {
    val docs = Tables.documents(spark, sf)
    val chunks = Retrieval.chunkDocuments(docs, "doc_id", "text", width = 64, stride = 48)
      .collect().groupBy(_.getLong(0))
    val nWords = docs
      .select(col("doc_id"), size(graft.functions.GraftFunctions.normWords(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (docId, rs) =>
      val n = nWords(docId)
      val expected = (n - 1) / 48 + 1
      assert(rs.length == expected, s"doc $docId: ${rs.length} chunks for $n words")
      val byIdx = rs.sortBy(_.getLong(1))
      byIdx.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i.toLong) // dense 0-based chunk ids
        val want = math.min(64, n - i * 48)
        assert(r.getLong(2) == want.toLong, s"doc $docId chunk $i: ${r.getLong(2)} tokens, want $want")
      }
    }
  }

  test("shard shuffle is deterministic, uniform-ish, and position-dense") {
    val docs = Tables.documents(spark, sf)
    val a = q("q85_shard_shuffle").collect()
    val b = q("q85_shard_shuffle").collect()
    assert(a.map(_.toSeq).sameElements(b.map(_.toSeq)), "must be reproducible")
    val byShard = a.groupBy(_.getLong(0))
    val n = docs.count()
    assert(byShard.keySet.subsetOf((0L until 16L).toSet))
    byShard.foreach { case (sh, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length.toLong),
        s"shard $sh positions not dense")
      // 16 uniform nibble shards: no shard should hold more than 4x its share
      assert(rs.length <= n / 16 * 4 + 8, s"shard $sh skewed: ${rs.length} of $n")
    }
    assert(a.length == n, "every row lands in exactly one shard")
  }

  test("shard shuffle stays uniform for non-power-of-16 shard counts") {
    // 32 hash bits mod 10: bias < 10/2^32 — every shard within 2x share
    val docs = Tables.documents(spark, sf)
    val out = graft.operators.Retrieval
      .shuffleIntoShards(docs, "doc_id", "bias-test", nShards = 10).collect()
    val n = out.length
    val byShard = out.groupBy(_.getLong(0))
    assert(byShard.keySet == (0L until 10L).toSet, "all 10 shards occupied")
    byShard.foreach { case (sh, rs) =>
      assert(rs.length <= n / 10 * 2 + 8, s"shard $sh skewed: ${rs.length} of $n")
    }
  }

  test("inverted index: df counts match, hot words carry no postings") {
    val rows = q("q86_inverted_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      if (df > 100) assert(r.isNullAt(2), s"hot word ${r.getString(0)} materialized postings")
      else {
        val ids = r.getString(2).split(",").map(_.toLong)
        assert(ids.length == df, s"word ${r.getString(0)}: ${ids.length} postings vs df=$df")
        assert(ids.sameElements(ids.sorted), "postings must be sorted")
      }
    }
  }

  test("inverted index plan never aggregates lists before the hot-word anti-join") {
    val plan = Retrieval.invertedIndex(Tables.documents(spark, sf), "doc_id", "text", 100)
      .queryExecution.optimizedPlan.toString
    // collect_list must sit ABOVE the anti-join in the optimized plan:
    // the join filters hot words out before any list buffer forms.
    val aggIdx = plan.indexOf("collect_list")
    val joinIdx = plan.indexOf("LeftAnti")
    assert(aggIdx >= 0 && joinIdx >= 0 && aggIdx < joinIdx,
      s"expected collect_list above LeftAnti join:\n$plan")
  }

  test("bm25 ranks term-bearing docs first and respects top-k") {
    val rows = q("q87_bm25").collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_)), "descending scores")
    assert(scores.head > 0.0, "top doc must contain at least one query term")
    // every returned score beats (or ties) any doc containing no term: 0
    assert(scores.forall(_ >= 0.0))
  }

  test("bm25 is a two-job plan: one stats aggregate broadcast into a narrow scan") {
    val plan = Retrieval.bm25TopK(Tables.documents(spark, sf), "doc_id", "text",
      Seq("data", "model")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), s"stats must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffled join allowed:\n$plan")
  }

  test("rank fusion: 20 fused rows, ranks bounded, rrf recomputes from its ranks") {
    val rows = RetrievalQueries.queries("q133_rank_fusion")(spark, sf).collect()
    assert(rows.length == 20)
    def rank(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    rows.foreach { r =>
      val (rl, rs, rrf) = (rank(r, 1), rank(r, 2), r.getDouble(3))
      assert(rl.nonEmpty || rs.nonEmpty, "a fused doc must appear in some list")
      (rl ++ rs).foreach(x => assert(x >= 1 && x <= 50))
      val expect = rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rs.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(rrf - expect) < 1e-6, s"rrf $rrf != recomputed $expect")
    }
    val fused = rows.map(_.getDouble(3))
    assert(fused.sameElements(fused.sortBy(-(_: Double))), "descending rrf")
  }

  test("q144 retrieval eval: excerpt queries find their source, metrics recompute") {
    val rows = q("q144_retrieval_eval").collect()
    assert(rows.length == 20, "one metrics row per query")
    rows.foreach { r =>
      val (qid, relId, rank) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(relId == qid - 2000000, "relevance label must be the source doc")
      assert(rank >= 1)
      assert(math.abs(r.getDouble(3) - math.rint(1e6 / rank) / 1e6) < 1e-9,
        s"rr must be round(1/rank, 6), got ${r.getDouble(3)} for rank $rank")
      assert(r.getBoolean(4) == (rank <= 10), "hit10 ≡ rank ≤ 10")
      assert((r.getDouble(5) == 0.0) == (rank > 10), "ndcg10 zero iff missed@10")
    }
    // a half-document excerpt retrieves its source near the top even
    // over sf0.001's short shared-vocabulary docs
    val mrr = rows.map(_.getDouble(3)).sum / rows.length
    assert(mrr > 0.6, s"MRR $mrr suspiciously low for excerpt queries")
    assert(rows.count(_.getBoolean(4)) >= 18, "recall@10 collapsed")
  }

  test("q177: graded nDCG bounded by 1, source doc dominates, all 3 grades findable") {
    val rows = SparkEntry.queries("q177_ndcg_graded")(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg10")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"ndcg10 $ndcg out of bounds")
      // the candidate set always contains the 3 graded docs (source +
      // 2 neighbors share vocabulary via the tiny corpus vocab)
      assert(r.getAs[Long]("n_rel_found") >= 1L)
    }
    // excerpt queries must mostly rank their source doc into the top 10
    assert(rows.map(_.getAs[Long]("src_in_top10")).sum >= 18L)
  }

  test("eval-set contract is code, not comment: oversized eval set throws") {
    import graft.operators.Retrieval
    val docs = Tables.documents(spark, sf)
    // under the cap: passes rows through untouched
    val ok = Retrieval.requireEvalBounded(docs.limit(5), 5L, "tiny eval")
    assert(ok.count() == 5)
    // LAZY (round 11): plan construction is free — no Spark job, no
    // throw — the guard fires at EXECUTION time (the q144/q177 guard)
    val oversized = Retrieval.requireEvalBounded(docs, 3L, "oversized eval")
    val e = intercept[Exception] { oversized.count() }
    // Spark wraps raise_error; the contract message must surface somewhere
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("eval-set contract")), e.toString)
  }

  test("q197 MMR: greedy trajectory invariants") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.RetrievalQueries.queries("q197_mmr_select")(spark, sf)
      .collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, picks) =>
      assert(picks.length == 5, s"query $q picked ${picks.length} != 5")
      assert(picks.map(_.getAs[Int]("step")).sorted.sameElements(1 to 5))
      val ids = picks.map(_.getAs[Long]("vec_id"))
      assert(ids.distinct.length == 5, s"query $q re-picked a candidate")
      // score(c) only falls as the selected set grows, so the picked
      // scores are non-increasing along the trajectory
      val scores = picks.sortBy(_.getAs[Int]("step")).map(_.getAs[Double]("mmr_score"))
      scores.sliding(2).foreach { case Array(a, b) =>
        assert(b <= a + 1e-9, s"query $q trajectory rose: $a -> $b")
      }
    }
    // step 1 is the pure-relevance argmax: 0.7 × the q34 top-1 cosine
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val top1 = graft.operators.Similarity
      .bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 1)
      .collect().map(r =>
        r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    byQ.foreach { case (q, picks) =>
      val p1 = picks.find(_.getAs[Int]("step") == 1).get
      assert(p1.getAs[Long]("vec_id") == top1(q),
        s"query $q step 1 is not the relevance argmax")
    }
  }

  test("q205 RAG context: budget packing is exact and prefix-closed") {
    val rows = graft.queries.RetrievalQueries.queries("q205_rag_context")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq ==
        (1L to byRank.length.toLong), s"query $q ranks not contiguous")
      // cumulative chars really accumulate in rank order
      var cum = 0L
      byRank.foreach { r =>
        cum += r.getAs[Long]("n_chars")
        assert(r.getAs[Long]("cum_chars") == cum, s"query $q cum drift")
        assert(r.getAs[Boolean]("fits") == (cum <= 600L))
        assert(r.getAs[Long]("clipped_chars") <= r.getAs[Long]("n_chars"))
      }
      // the packed context never exceeds the budget
      assert(byRank.map(_.getAs[Long]("clipped_chars")).sum <= 600L,
        s"query $q blew the char budget")
      // fits is prefix-closed: once a doc doesn't fit, none after it do
      val fitSeq = byRank.map(_.getAs[Boolean]("fits")).toSeq
      assert(fitSeq == fitSeq.sortBy(!_), s"query $q fits not prefix-closed")
    }
  }
}
