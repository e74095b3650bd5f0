package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticQueries

class AnalyticSpec extends SparkSpecBase {

  test("every analytic query runs and returns rows at sf0.001") {
    AnalyticQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
    assert(AnalyticQueries.oracleSql.keySet == AnalyticQueries.queries.keySet)
  }

  test("rollup emits the grand-total row") {
    val r = AnalyticQueries.queries("q47_rollup")(spark, sf)
    val grand = r.filter(col("n_name").isNull && col("c_mktsegment").isNull)
    assert(grand.count() == 1)
    assert(grand.first().getAs[Long]("n_customers")
      == Tables.customer(spark, sf).count())
  }

  test("running total is monotone per customer") {
    val w = AnalyticQueries.queries("q48_window_frames")(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val lagged = w.withColumn("prev",
      lag(col("running_total"), 1).over(
        Window.partitionBy("o_custkey").orderBy("order_seq")))
    assert(lagged.filter(col("prev") > col("running_total")).count() == 0)
  }
}
