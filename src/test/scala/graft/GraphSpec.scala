package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** PageRank semantics on graphs with known structure. */
class GraphSpec extends SparkSpecBase {

  import spark.implicits._

  test("star graph: the hub outranks every leaf; dangling chain decays") {
    // 10 leaves → hub 0; hub has no out-edges (dangling)
    val star = (1L to 10L).map(i => (i, 0L)).toDF("src", "dst")
    val ranks = Graph.pageRank(star, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(0L) > ranks(1L) * 5, s"hub must dominate: $ranks")
    assert((1L to 10L).map(ranks).distinct.size == 1, "symmetric leaves rank equally")
    assert(ranks.values.forall(_ >= 0.15 - 1e-9), "(1-d) floor holds for every node")
  }

  test("rank flows along a chain with damping") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val ranks = Graph.pageRank(chain, iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // downstream accumulates: 1 < 2 < 3 < 4 is NOT monotone under the
    // unnormalized formulation; but 2,3,4 each exceed the source floor
    assert(math.abs(ranks(1L) - 0.15) <= 1e-12, "a source node sits at the (1-d) floor")
    assert(ranks(2L) > ranks(1L) && ranks(3L) > ranks(1L) && ranks(4L) > ranks(1L))
  }

  test("pageRank is reproducible run to run") {
    val edges = Tables.orders(spark, sf)
      .select((col("o_custkey") % 50).as("src"), (col("o_orderkey") % 50).as("dst"))
      .filter(col("src") =!= col("dst"))
    val a = Graph.pageRank(edges, iters = 3).orderBy("id").collect().toSeq
    val b = Graph.pageRank(edges, iters = 3).orderBy("id").collect().toSeq
    assert(a == b)
  }

}
