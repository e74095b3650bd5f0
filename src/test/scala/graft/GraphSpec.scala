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

  test("triangle counts: K4 has every node in C(3,2)=3 triangles; adding a pendant edge changes nothing") {
    val k4 = Seq((0L,1L),(0L,2L),(0L,3L),(1L,2L),(1L,3L),(2L,3L),(3L,9L))
      .toDF("a", "b")
    val counts = Graph.triangleCounts(k4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"K4 triangle participation wrong: $counts")
  }

  test("bfs: min-hop distances on a diamond with a shortcut") {
    // 0→1→3, 0→2→3, 3→4, plus shortcut 0→4; node 5 unreachable from 0
    val edges = Seq((0L,1L),(0L,2L),(1L,3L),(2L,3L),(3L,4L),(0L,4L),(5L,0L))
      .toDF("src", "dst")
    val d = Graph.bfs(edges, source = 0L, maxDepth = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L),
      s"bfs distances wrong: $d")
  }

  test("bfs depth bound truncates exactly at maxDepth") {
    val chain = (0L until 6L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("src", "dst")
    val d = Graph.bfs(chain, source = 0L, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L),
      s"depth-3 bfs must stop at node 3: $d")
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
