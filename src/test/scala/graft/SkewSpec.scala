package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpecBase {

  test("salted join result equals unsalted join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
    val o = Tables.orders(spark, sf).select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .orderBy("o_orderpriority").collect().toSeq
    val salted = Skew.saltedJoin(li, o, "l_orderkey", col("l_partkey"), salts = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(salted == plain)
  }

  test("q111 shuffle key includes the salt — the hot key spreads over N reducers") {
    val df = graft.queries.OpsQueries.queries("q111_salted_join")(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    // the join's exchange must partition on (hot_key, __salt): with a
    // planted hot key holding ~75% of rows, partitioning on hot_key
    // alone would funnel them through one reducer
    assert(plan.contains("__salt"), s"salt not in the shuffle/join keys:\n$plan")
    val exchanges = plan.split("\n").filter(l =>
      l.contains("hashpartitioning") && l.contains("hot_key"))
    assert(exchanges.forall(_.contains("__salt")),
      s"an exchange partitions on the bare hot key:\n${exchanges.mkString("\n")}")
  }

  test("the deterministic salt actually spreads the planted hot key") {
    // distribution check on the salted left side itself: the hot key's
    // rows must land in all 8 salt groups, with no group holding more
    // than half the hot rows (xxhash64 on a high-entropy source)
    val li = Tables.lineitem(spark, sf).select(
      when(col("l_orderkey") % 4 =!= 0, lit(0L))
        .otherwise(col("l_orderkey") % 100).as("hot_key"),
      col("l_partkey"))
    val groups = li.filter(col("hot_key") === 0L)
      .withColumn("__salt", pmod(xxhash64(col("l_partkey")), lit(8)))
      .groupBy("__salt").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = groups.values.sum
    assert(groups.size == 8, s"hot key uses only salts ${groups.keySet}")
    assert(groups.values.max < total / 2,
      s"salt distribution degenerate: $groups")
  }
}
