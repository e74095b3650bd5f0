package graft

import org.apache.spark.sql.functions._

import graft.streaming.EwmaMonitor
import graft.streaming.EwmaMonitor.{Obs, Verdict}

/** Streaming EWMA monitor invariants: the cross-batch recurrence
  * equals a sequential golden fold, emissions are deterministic under
  * shuffled arrival within a batch, and state stays one row per
  * series regardless of stream length.
  */
class EwmaMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeChunks(dir: java.nio.file.Path,
                          chunks: Seq[Seq[Obs]]): Unit =
    chunks.zipWithIndex.foreach { case (obs, i) =>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-ewma-c$i")
      obs.toDF().coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = scala.jdk.CollectionConverters
        .IteratorHasAsScala(java.nio.file.Files.list(stage).iterator()).asScala
        .find(_.toString.endsWith(".parquet")).get
      val dst = dir.resolve(f"chunk$i%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }

  private val obsSchema = org.apache.spark.sql.Encoders.product[Obs].schema

  test("cross-batch recurrence equals the sequential golden fold; spike + decay tail flagged") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // series "a": flat 10s with one 100 spike in batch 2;
      // series "b": linear ramp split across all three batches
      val a = (1 to 9).map(i =>
        Obs("a", i * 1000L, i.toLong, if (i == 6) 100.0 else 10.0))
      val b = (1 to 9).map(i => Obs("b", i * 1000L, 100L + i, i * 2.0))
      val chunks = Seq(
        a.take(3) ++ b.take(3), a.slice(3, 6) ++ b.slice(3, 6),
        a.drop(6) ++ b.drop(6))
      val dir = java.nio.file.Files.createTempDirectory("graft-ewma")
      writeChunks(dir, chunks)

      val stream = spark.readStream.schema(obsSchema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[Obs]
      val out = EwmaMonitor.monitor(stream)
      val (table, progress) = graft.streaming.EventStream
        .runToCompletionAppendTracked(spark, out.toDF(), "graft_ewma_mon")
      val got = table.as[Verdict].collect().sortBy(v => (v.key, v.n))

      // golden: one sequential fold over each full series
      val golden = (EwmaMonitor.fold(0.0, 0L, 0.5, 0.5, a)._3 ++
        EwmaMonitor.fold(0.0, 0L, 0.5, 0.5, b)._3).sortBy(v => (v.key, v.n))
      assert(got.length == golden.length)
      got.zip(golden).foreach { case (g, e) =>
        assert(g.key == e.key && g.id == e.id && g.n == e.n)
        assert(math.abs(g.ewma - e.ewma) < 1e-12,
          s"${g.key}/${g.n}: ewma ${g.ewma} != ${e.ewma}")
        assert(g.isSpike == e.isSpike)
      }
      // the 100 in series a flags, and so does its decay tail (ewma
      // needs two more points to settle back within the band) — the
      // textbook EWMA response; series b's smooth ramp never flags
      assert(got.filter(_.isSpike).map(_.id).toSeq == Seq(6L, 7L, 8L))
      assert(!got.exists(v => v.key == "b" && v.isSpike))
      // state: one row per series, never per event
      val rows = progress.map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(rows.nonEmpty && rows.max <= 2, s"state rows grew: $rows")
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("within-batch emission order is (ts, id), not arrival order") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // one batch, rows written REVERSED — fold must still run 1..5
      val series = (1 to 5).map(i => Obs("k", i * 1000L, i.toLong, i * 1.0))
      val dir = java.nio.file.Files.createTempDirectory("graft-ewma-rev")
      writeChunks(dir, Seq(series.reverse))
      val stream = spark.readStream.schema(obsSchema)
        .parquet(dir.toString).as[Obs]
      val out = EwmaMonitor.monitor(stream)
      val got = graft.streaming.EventStream
        .runToCompletionAppend(spark, out.toDF(), "graft_ewma_rev")
        .as[Verdict].collect().sortBy(_.n)
      val golden = EwmaMonitor.fold(0.0, 0L, 0.5, 0.5, series)._3
      got.zip(golden).foreach { case (g, e) =>
        assert(g.id == e.id && math.abs(g.ewma - e.ewma) < 1e-12)
      }
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }
}
