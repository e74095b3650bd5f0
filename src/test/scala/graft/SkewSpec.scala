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

  test("AQE splits a skewed join partition at runtime (the no-code-change path)") {
    // the complement to manual salting: with AQE skew handling tuned
    // to the test scale, a join keyed on a planted hot key must come
    // back with the skewed partition SPLIT by the runtime — the
    // mechanism graft relies on at 100 TB for skew it did not predict
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // hot key 0 holds ~75% of lineitem rows on both join sides.
      // repartition(8) first: a skewed reduce partition can only be
      // split along MAP-task boundaries, and a single parquet file
      // scans as one map task
      val l = Tables.lineitem(spark, sf).repartition(8).select(
        when(col("l_orderkey") % 4 =!= 0, lit(0L))
          .otherwise(col("l_orderkey") % 100).as("k"),
        col("l_quantity"), col("l_shipdate"), col("l_discount"), col("l_tax"))
      // the dimension side must reach the join as Sort(ShuffleStage)
      // DIRECTLY — an aggregate between them breaks OptimizeSkewedJoin's
      // pattern match (it can only duplicate a raw shuffle read)
      import spark.implicits._
      val r = (0L to 96L by 4).map(k => (k, k * 1.5)).toDF("k", "dim_val")
      val joined = l.join(r, Seq("k"))
      joined.collect() // materialize THIS plan: AQE finalizes with runtime stats
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark/split the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
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
