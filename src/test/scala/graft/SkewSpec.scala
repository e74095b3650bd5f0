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
}
