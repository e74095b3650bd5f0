package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY §2.3 — graph analytics over an edge list, complementing the
  * connected components in [[Dedup.connectedComponents]]: PageRank by
  * power iteration. Every step is a distributed join/aggregate — the
  * driver never sees a row; per-round localCheckpoint caps lineage
  * (the CC lesson: persist alone leaves the plan tree growing).
  * A fixed iteration count keeps the result reproducible.
  */
object Graph {

  /** PageRank over (src, dst) edges. Returns (id, rank). Dangling
    * nodes (no out-edges) contribute no redistributed mass — the
    * plain (1−d) + d·Σ formulation, reproducible and join-only.
    * At 100 TB: edges partition by src for the contribution join and
    * by dst for the aggregation — two shuffles per round, both on
    * uniform-ish keys; skewed hub dsts are exactly what AQE's skew
    * handling splits.
    */
  def pageRank(edgesIn: DataFrame, iters: Int = 10,
               damping: Double = 0.85): DataFrame = {
    val edges = edgesIn.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).persist()
    val nodes = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct().persist()
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("__out")).persist()
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks, edges("src") === ranks("id"))
        .join(outDeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("__out")).as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
        .localCheckpoint() // cap lineage across rounds
    }
    ranks
  }
}
