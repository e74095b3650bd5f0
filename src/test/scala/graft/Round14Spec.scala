package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.queries.GraphQueries

/** Invariants for the round-14 operators. Every oracled query here is
  * also hash-checked against DuckDB; these cases pin the SEMANTIC
  * properties a hash can't name.
  */
class Round14Spec extends SparkSpecBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("q243: integer HITS path-count identities, zeroed sources/sinks, norms in [0,1]") {
    val r = GraphQueries.queries("q243_hits")(spark, sf01).collect()
    assert(r.nonEmpty)
    // recompute the round-1 identity independently: after h0 == 1,
    // auth-after-one-round(v) = indegree(v); the returned auth is
    // round TWO, so check instead auth > 0 <=> node has an in-edge
    // and hub > 0 <=> node has an out-edge.
    val edges = Tables.orders(spark, sf01)
      .select((col("o_custkey") % 200).as("src"), (col("o_orderkey") % 200).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().collect()
    val hasIn = edges.map(_.getAs[Long]("dst")).toSet
    val hasOut = edges.map(_.getAs[Long]("src")).toSet
    r.foreach { row =>
      val id = row.getAs[Long]("id")
      val auth = row.getAs[Long]("auth"); val hub = row.getAs[Long]("hub")
      assert((auth > 0) == hasIn.contains(id), s"auth sign wrong for $id")
      assert((hub > 0) == hasOut.contains(id), s"hub sign wrong for $id")
      val an = row.getAs[Double]("auth_norm"); val hn = row.getAs[Double]("hub_norm")
      assert(an >= 0.0 && an <= 1.0 && hn >= 0.0 && hn <= 1.0)
    }
    assert(r.exists(_.getAs[Double]("auth_norm") == 1.0), "no max-auth node at 1.0")
    assert(r.exists(_.getAs[Double]("hub_norm") == 1.0), "no max-hub node at 1.0")
  }

  test("q244: 8 peel rounds reach the true 3-core fixpoint; member degrees >= 3") {
    val edges = Tables.orders(spark, sf01)
      .filter(col("o_orderkey") % 10 === 1)
      .select((col("o_custkey") % 200).as("a"), (col("o_orderkey") % 200).as("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") < col("b"))
    val r8 = Graph.kCore(edges, k = 3, rounds = 8).collect()
    assert(r8.nonEmpty, "3-core empty at sf0.01 — graph fixture degraded")
    r8.foreach { row =>
      assert(row.getAs[Long]("core_deg") >= 3L, s"member below k: $row")
    }
    // one more round is a no-op => the bounded unroll hit the fixpoint
    val r9 = Graph.kCore(edges, k = 3, rounds = 9).collect()
    assert(r8.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      r9.map(r => (r.getLong(0), r.getLong(1))).toSet,
      "round 9 changed the survivor set — not a fixpoint at 8 rounds")
  }
}
