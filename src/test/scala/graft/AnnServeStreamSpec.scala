package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq
import graft.streaming.AnnServeStream

/** Streaming ANN serving invariants: batch parity (the stream's
  * answers equal a direct probeIndex of the same queries) and
  * exactly-once on replay (a restarted stream with the same
  * checkpoint reprocesses nothing).
  */
class AnnServeStreamSpec extends SparkSpecBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-annserve-spec").toString

  test("stream serves each arriving query file; answers match the batch probe") {
    val base = tmp()
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    Pq.writeIndex(emb, s"$base/index", m = 8, ksub = 16, nCentroids = 8)

    // two arrival files → with maxFilesPerTrigger the source would
    // split them; AvailableNow may batch them together — either way
    // every query must be answered exactly once across batch dirs
    emb.filter(col("vec_id") < 3).write.parquet(s"$base/queries")
    emb.filter(col("vec_id") >= 3 && col("vec_id") < 6)
      .write.mode("append").parquet(s"$base/queries")

    AnnServeStream.run(spark, s"$base/index", s"$base/queries",
      s"$base/out", s"$base/ckpt", k = 5, nProbe = 4, m = 8)

    val served = spark.read.parquet(s"$base/out")
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
    val expected = Pq.probeIndex(spark, s"$base/index",
      emb.filter(col("vec_id") < 6), k = 5, nProbe = 4, m = 8)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))

    assert(served.count() == expected.count())
    assert(served.except(expected).count() == 0 &&
      expected.except(served).count() == 0,
      "streamed answers must equal the direct batch probe")
  }

  test("replay with the same checkpoint is a no-op (exactly-once)") {
    val base = tmp()
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    Pq.writeIndex(emb, s"$base/index", m = 8, ksub = 16, nCentroids = 8)
    emb.filter(col("vec_id") < 3).write.parquet(s"$base/queries")

    AnnServeStream.run(spark, s"$base/index", s"$base/queries",
      s"$base/out", s"$base/ckpt", k = 5, nProbe = 4, m = 8)
    val first = spark.read.parquet(s"$base/out").collect().toSet

    // restart with the same checkpoint: no new files → no new output
    AnnServeStream.run(spark, s"$base/index", s"$base/queries",
      s"$base/out", s"$base/ckpt", k = 5, nProbe = 4, m = 8)
    val second = spark.read.parquet(s"$base/out").collect().toSet
    assert(first == second, "replay must not duplicate or change output")

    // a NEW arrival is served incrementally without touching old batches
    emb.filter(col("vec_id") >= 3 && col("vec_id") < 5)
      .write.mode("append").parquet(s"$base/queries")
    AnnServeStream.run(spark, s"$base/index", s"$base/queries",
      s"$base/out", s"$base/ckpt", k = 5, nProbe = 4, m = 8)
    val third = spark.read.parquet(s"$base/out")
    assert(third.select("query_id").distinct().count() == 5)
    assert(third.collect().toSet.intersect(first) == first,
      "previously served batches must be untouched by the restart")
  }
}
