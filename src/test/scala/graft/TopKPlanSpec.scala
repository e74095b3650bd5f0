package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPlan
import graft.queries.AnalyticQueries

class TopKPlanSpec extends SparkSpecBase {

  test("native top-k plans TopKPerKeyExec with no Window and no SQL-level shuffle below it") {
    val df = AnalyticQueries.queries("q113_topk_native")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"custom exec missing:\n$plan")
    // the k-bounded shuffle lives INSIDE the exec (RDD-level); below
    // the exec the SQL plan must contain no Exchange and nowhere a
    // Window (the formulation this operator replaces)
    val body = plan.split("TopKPerKey", 2)(1)
    assert(!body.contains("Exchange"), s"unexpected SQL shuffle below the exec:\n$plan")
    assert(!plan.contains("Window"), "fell back to the window formulation")
  }

  test("native path equals the window row_number formulation") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val native = TopKPlan.topKPerKey(li, Seq("l_orderkey"),
        "l_extendedprice", "l_linenumber", k = 2)
      .collect().map(_.toSeq.mkString("|")).toSet
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    val windowed = li.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 2)
      .collect().map(_.toSeq.mkString("|")).toSet
    assert(native.nonEmpty, "top-k returned nothing — test data degenerate")
    assert(native == windowed)
  }

  test("map-side key-cap flush keeps the result exact (partial-fallback path)") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    // l_orderkey has ~1500 distinct values at sf0.001; a cap of 7
    // forces hundreds of mid-partition flushes — the final stage must
    // still re-select the exact top-k
    val capped = TopKPlan.topKPerKey(li, Seq("l_orderkey"),
        "l_extendedprice", "l_linenumber", k = 2, maxKeysInFlight = 7)
      .collect().map(_.toSeq.mkString("|")).toSet
    val uncapped = TopKPlan.topKPerKey(li, Seq("l_orderkey"),
        "l_extendedprice", "l_linenumber", k = 2)
      .collect().map(_.toSeq.mkString("|")).toSet
    assert(capped == uncapped)
  }

  test("k larger than the group emits the whole group, ranked 1..n") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 30.0), ("b", 3L, 5.0))
      .toDF("key", "id", "score")
    val out = TopKPlan.topKPerKey(df, Seq("key"), "score", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(out == Set(("a", 2L, 1), ("a", 1L, 2), ("b", 3L, 1)))
  }

  test("ties break on the ascending tie column, deterministically") {
    import spark.implicits._
    val df = Seq(("a", 5L, 1.0), ("a", 3L, 1.0), ("a", 4L, 1.0), ("a", 9L, 2.0))
      .toDF("key", "id", "score")
    val out = TopKPlan.topKPerKey(df, Seq("key"), "score", "id", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSet
    // 2.0 wins; among the 1.0 ties the SMALLEST id ranks next
    assert(out == Set((9L, 1), (3L, 2)))
  }

  test("null score / null key rows are dropped, not ranked") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), 1L, Some(10.0)), (Some("a"), 2L, None),
      (None, 3L, Some(99.0)), (Some("a"), 4L, Some(20.0)))
      .toDF("key", "id", "score")
    val out = TopKPlan.topKPerKey(df, Seq("key"), "score", "id", k = 3)
      .collect().map(r => r.getLong(1)).toSet
    assert(out == Set(1L, 4L))
  }

  test("multi-column keys group independently") {
    import spark.implicits._
    val df = Seq(
      ("a", "x", 1L, 1.0), ("a", "x", 2L, 2.0),
      ("a", "y", 3L, 3.0), ("b", "x", 4L, 4.0))
      .toDF("k1", "k2", "id", "score")
    val out = TopKPlan.topKPerKey(df, Seq("k1", "k2"), "score", "id", k = 1)
      .collect().map(r => r.getLong(2)).toSet
    assert(out == Set(2L, 3L, 4L))
  }
}
