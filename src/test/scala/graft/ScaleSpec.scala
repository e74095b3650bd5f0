package graft

import org.apache.spark.sql.functions._
import graft.queries.SketchQueries
import graft.streaming.StatefulSessions

class ScaleSpec extends SparkSpecBase {

  test("sketch aggregates are within the advertised error of exact") {
    val r = SketchQueries.queries("q46_sketch_agg")(spark, sf)
    val bad = r.filter(
      abs(col("approx_parts") - col("exact_parts")).cast("double")
        / col("exact_parts") > 0.1)
    assert(bad.count() == 0)
  }

  test("bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables between JVMs but their
    // files survive — clear the warehouse dirs explicitly
    Seq("b_orders", "b_customer").foreach { t =>
      val p = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_name"))
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_customer")
    // disable broadcast so the planner exercises the bucketed
    // sort-merge path (at 100 TB neither side would broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: no Exchange feeding the SortMergeJoin
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.orders(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("stateful streaming sessionizer matches batch sessionize") {
    val streamed = StatefulSessions.run(spark, sf, gapSeconds = 1800L)
      .select(col("user_id"), col("session_start_us"), col("session_end_us"), col("n_events"))
      .orderBy("user_id", "session_start_us")
      .collect().toSeq
    val batch = graft.queries.TemporalQueries.queries("q44_sessionize")(spark, sf)
      .select(col("user_id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"))
      .orderBy("user_id", "s")
      .collect().toSeq
    assert(streamed.size == batch.size)
    streamed.zip(batch).foreach { case (a, b) => assert(a == b) }
  }
}
