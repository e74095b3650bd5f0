package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-8 plan-shape lock-in: every flagship query carries a SHUFFLE
  * BUDGET — the number of Exchange nodes its plan is allowed to
  * contain. A refactor that silently adds a shuffle (a lost broadcast
  * hint, a window sneaking in front of an aggregate, a lambda barrier
  * splitting a narrow front) fails HERE, at sf0.001 in seconds,
  * instead of surfacing as a 100 TB regression. Budgets are the
  * measured round-8 counts — tighten them if a plan improves.
  */
class ShuffleBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val budgets: Map[String, Int] = Map(
    // narrow codegen'd kernels + one partial agg (+ range sort)
    "q36_lang_id" -> 1,
    "q37_quality_score" -> 1,
    "q131_nfc_normalize" -> 1,
    // single-shuffle operators (native or partial-agg)
    "q110_simhash_pairs_native" -> 1, // ONE internal repartition+sort
    "q113_topk_native" -> 1,          // k-bounded partials, one exchange
    "q150_reservoir_sample" -> 1,     // ticket race rides TopKPerKeyExec
    "q01_pricing_summary" -> 2,       // partial+final agg, range sort
    "q30_exact_dedup" -> 2,           // md5 group + order
    "q157_html_extract" -> 2,         // narrow regex front; doc rollup + sort
    "q115_classifier_filter" -> 2,    // inference folded into the scan
    // bounded multi-stage shapes
    "q70_decontaminate" -> 3,
    "q147_span_dedup" -> 3,           // countDistinct expand + sort
    "q149_winnow_dedup" -> 3,
    "q43b_asof_native" -> 3,          // co-partition both sides + sort
    "q129_interval_native" -> 4,
    "q156_exact_substr" -> 3,         // gram agg + hit join + doc window
                                      // (island groupBy reuses the window
                                      // partitioning; extents stay narrow)
    "q31b_lsh_pairs" -> 6,
    "q73_tfidf" -> 7,
    "q107_token_budget" -> 7)

  private val exchangeRe =
    ("Exchange hashpartitioning|Exchange rangepartitioning|" +
      "Exchange SinglePartition").r

  test("flagship queries stay within their shuffle budgets") {
    val over = budgets.toSeq.sortBy(_._1).flatMap { case (name, budget) =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val n = exchangeRe.findAllIn(plan).size
      if (n > budget) Some(s"$name: $n exchanges > budget $budget") else None
    }
    assert(over.isEmpty, over.mkString("; "))
  }
}
