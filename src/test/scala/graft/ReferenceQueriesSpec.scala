package graft

import org.apache.spark.sql.functions._
import graft.queries.ReferenceQueries

class ReferenceQueriesSpec extends SparkSpecBase {

  test("every reference query runs and returns rows at sf0.001") {
    ReferenceQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracle keys match query keys") {
    assert(ReferenceQueries.oracleSql.keySet == ReferenceQueries.queries.keySet)
  }

  test("q11 separate_rows explodes every word of p_name") {
    val words = ReferenceQueries.queries("q11_separate_rows")(spark, sf)
    val expected = Tables.part(spark, sf)
      .select(explode(split(col("p_name"), " "))).count()
    assert(words.count() == expected) // no empty fragments in p_name
  }

  test("q12 pivot counts sum back to total orders") {
    val piv = ReferenceQueries.queries("q12_pivot_wider")(spark, sf)
    val total = piv.agg(sum(col("n_f") + col("n_o") + col("n_p"))).first().getLong(0)
    assert(total == Tables.orders(spark, sf).count())
  }

  test("q13 pct_low is bounded [0,100] and consistent with n_low/n_lines") {
    val bad = ReferenceQueries.queries("q13_essentiality_matrix")(spark, sf)
      .filter(col("pct_low") < 0 || col("pct_low") > 100 ||
        abs(col("pct_low") - col("n_low") * 100.0 / col("n_lines")) > 5e-7) // pct_low is round(x,6)
    assert(bad.count() == 0)
  }

  test("q20 top-k is ordered descending") {
    val rows = ReferenceQueries.queries("q20_topk_orders")(spark, sf)
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(rows.length == 10 && rows.sameElements(rows.sortBy(-_)))
  }

  test("q22 bridge joins broadcast both dims") {
    val plan = ReferenceQueries.queries("q22_id_bridge")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
