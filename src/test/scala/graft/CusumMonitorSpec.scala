package graft

import graft.streaming.CusumMonitor
import graft.streaming.CusumMonitor.{Obs, Verdict}

/** Streaming CUSUM monitor invariants: the cross-batch recursion
  * equals a sequential golden fold, a sustained small shift alarms
  * where a spike band would not, the in-control series never alarms,
  * alarms reset the accumulators, and state stays one row per series.
  */
class CusumMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeChunks(dir: java.nio.file.Path,
                          chunks: Seq[Seq[Obs]]): Unit =
    chunks.zipWithIndex.foreach { case (obs, i) =>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-cusum-c$i")
      obs.toDF().coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = scala.jdk.CollectionConverters
        .IteratorHasAsScala(java.nio.file.Files.list(stage).iterator()).asScala
        .find(_.toString.endsWith(".parquet")).get
      val dst = dir.resolve(f"chunk$i%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1100000000000L + i * 60000L))
    }

  private val obsSchema = org.apache.spark.sql.Encoders.product[Obs].schema

  test("cross-batch recursion equals the golden fold; sustained shift alarms, in-control never") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // series "a": in-control around 10, then a sustained +2 shift
      // from i=7 — small enough that no single point is a spike, but
      // CUSUM accumulates to an alarm; series "b": stays in control
      val a = (1 to 12).map(i =>
        Obs("a", i * 1000L, i.toLong,
          if (i >= 7) 12.0 + (if (i % 2 == 0) 0.2 else -0.2)
          else 10.0 + (if (i % 2 == 0) 0.3 else -0.3)))
      val b = (1 to 12).map(i =>
        Obs("b", i * 1000L, 100L + i, 10.0 + (if (i % 3 == 0) 0.4 else -0.2)))
      val chunks = Seq(
        a.take(4) ++ b.take(4), a.slice(4, 8) ++ b.slice(4, 8),
        a.drop(8) ++ b.drop(8))
      val dir = java.nio.file.Files.createTempDirectory("graft-cusum")
      writeChunks(dir, chunks)

      val (target, slack, h) = (10.0, 0.5, 4.0)
      val stream = spark.readStream.schema(obsSchema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[Obs]
      val out = CusumMonitor.monitor(stream, target, slack, h)
      val (table, progress) = graft.streaming.EventStream
        .runToCompletionAppendTracked(spark, out.toDF(), "graft_cusum_mon")
      val got = table.as[Verdict].collect().sortBy(v => (v.key, v.n))

      val golden = (CusumMonitor.fold((0.0, 0.0, 0L), target, slack, h, a)._2
        ++ CusumMonitor.fold((0.0, 0.0, 0L), target, slack, h, b)._2)
        .sortBy(v => (v.key, v.n))
      assert(got.length == golden.length)
      got.zip(golden).foreach { case (g, e) =>
        assert(g.key == e.key && g.id == e.id && g.n == e.n)
        assert(math.abs(g.sPos - e.sPos) < 1e-12 &&
          math.abs(g.sNeg - e.sNeg) < 1e-12,
          s"${g.key}/${g.n}: (${g.sPos},${g.sNeg}) != (${e.sPos},${e.sNeg})")
        assert(g.alarm == e.alarm)
      }
      // the +2 shift alarms within a few points of onset (i >= 7),
      // and no single observation exceeds target + h (not a spike)
      val alarms = got.filter(v => v.key == "a" && v.alarm).map(_.id)
      assert(alarms.nonEmpty && alarms.head >= 7L && alarms.head <= 11L,
        s"shift alarm late/missing: $alarms")
      assert(a.forall(_.value < target + h), "fixture must not be spike-detectable")
      assert(!got.exists(v => v.key == "b" && v.alarm), "in-control series alarmed")
      // alarms reset: the accumulator right after an alarm restarts below h
      alarms.foreach { id =>
        got.find(v => v.key == "a" && v.id == id + 1).foreach { nxt =>
          assert(nxt.sPos <= (nxt.value - target - slack).max(0.0) + 1e-12,
            s"post-alarm sPos ${nxt.sPos} did not reset")
        }
      }
      // state: one row per series, never per event
      val rows = progress.map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(rows.nonEmpty && rows.max <= 2, s"state rows grew: $rows")
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("state layout round-trips and the fold is arrival-order independent within (ts,id)") {
    val s = CusumMonitor.pack(1.25, 0.5, 42L)
    assert(CusumMonitor.unpack(s) == ((1.25, 0.5, 42L)))
    val obs = Seq(Obs("k", 3L, 3L, 11.0), Obs("k", 1L, 1L, 9.0),
      Obs("k", 2L, 2L, 12.0))
    val sorted = obs.sortBy(o => (o.tsMicros, o.id))
    val (s1, v1) = CusumMonitor.fold((0.0, 0.0, 0L), 10.0, 0.5, 4.0, sorted)
    val (s2, v2) = CusumMonitor.fold((0.0, 0.0, 0L), 10.0, 0.5, 4.0,
      obs.reverse.sortBy(o => (o.tsMicros, o.id)))
    assert(s1 == s2 && v1 == v2)
  }
}
