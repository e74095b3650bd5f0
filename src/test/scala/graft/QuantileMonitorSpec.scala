package graft

import org.apache.spark.sql.functions._

import graft.streaming.{EventStream, QuantileMonitor}
import graft.streaming.QuantileMonitor.Obs

/** Round-8 streaming exact-quantile monitor: 3-batch replay must
  * reproduce the batch-exact histogram and nearest-rank quantiles.
  */
class QuantileMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  test("3-batch replay yields the exact histogram and exact quantiles") {
    // transformWithState requires the RocksDB state store provider —
    // scope it to this test so the rest of the suite keeps the default
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try { runReplay() }
    finally { prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    } }
  }

  private def runReplay(): Unit = {
    val lengths = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("int").as("value"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // three deterministic chunks by doc_id mod 3
    val srcDir = java.nio.file.Files.createTempDirectory("graft-qm-src")
    (0 until 3).foreach { i =>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-qm-c$i")
      lengths.filter(_._1 % 3 == i).toSeq.toDF("doc_id", "value")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = scala.jdk.CollectionConverters.IteratorHasAsScala(
        java.nio.file.Files.list(stage).iterator()).asScala
        .find(_.toString.endsWith(".parquet")).get
      val dst = srcDir.resolve(f"chunk$i%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1200000000000L + i * 60000L))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.IntegerType)))
    val obs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      .select((col("value") % 8).cast("long").as("shard"), col("value"))
      .as[Obs]
    val emitted = EventStream.runToCompletionAppend(spark,
      QuantileMonitor.monitor(obs).toDF(), "graft_qm")

    // counts only grow across emissions: the running histogram is the
    // max count per value, and it must equal the batch-exact counts
    val running = emitted.groupBy("value")
      .agg(max(col("count")).as("count"))
    val exact = lengths.groupBy(_._2).map { case (v, xs) => v -> xs.length.toLong }
    val got = running.as[(Int, Long)].collect().toMap
    assert(got == exact, s"histogram mismatch: ${got.size} vs ${exact.size} values")

    // exact nearest-rank quantiles from the histogram == from raw data
    val qs = Seq(0.5, 0.95, 0.99)
    val fromHist = QuantileMonitor.histogramQuantiles(running, qs)
      .as[(Double, Int)].collect().toMap
    val sorted = lengths.map(_._2).sorted
    qs.foreach { q =>
      val rank = math.ceil(q * sorted.length).toInt
      assert(fromHist(q) == sorted(rank - 1),
        s"p$q: ${fromHist(q)} != ${sorted(rank - 1)}")
    }

    // the RAW emitted frame (every micro-batch re-emits a shard's full
    // current counts) must give the SAME quantiles: histogramQuantiles
    // max-merges per (shard, value) internally before summing
    val fromRaw = QuantileMonitor.histogramQuantiles(emitted, qs)
      .as[(Double, Int)].collect().toMap
    assert(fromRaw == fromHist,
      s"raw emitted output double-counted: $fromRaw vs $fromHist")

    // state is domain-bounded: one row per (shard, value), shards disjoint
    val perValueShards = emitted.select("value", "shard").distinct()
      .groupBy("value").agg(countDistinct("shard").as("ns"))
    assert(perValueShards.filter(col("ns") =!= 1).count() == 0)
  }
}
