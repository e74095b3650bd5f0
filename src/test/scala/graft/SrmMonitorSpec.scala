package graft

import org.apache.spark.sql.functions._

import graft.streaming.SrmMonitor
import graft.streaming.SrmMonitor.{Assign, Health}

/** Streaming SRM monitor invariants: cross-batch counts accumulate
  * exactly, the biased stream flags while the balanced one never
  * does, the Scala tail polynomial is bit-identical to the SQL text
  * both batch engines evaluate, and the streaming verdict on q314's
  * final counts equals the batch query's row.
  */
class SrmMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeChunks(dir: java.nio.file.Path,
                          chunks: Seq[Seq[Assign]]): Unit =
    chunks.zipWithIndex.foreach { case (obs, i) =>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-srm-c$i")
      obs.toDF().coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = scala.jdk.CollectionConverters
        .IteratorHasAsScala(java.nio.file.Files.list(stage).iterator()).asScala
        .find(_.toString.endsWith(".parquet")).get
      val dst = dir.resolve(f"chunk$i%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1200000000000L + i * 60000L))
    }

  private val schema = org.apache.spark.sql.Encoders.product[Assign].schema

  test("biased stream flags, balanced stream never; counts accumulate across batches") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // "bad": 90/10 split, 300 assignments; "good": alternating 50/50
    val bad = (1 to 300).map(i =>
      Assign("bad", i * 1000L, i.toLong, if (i % 10 == 0) 1 else 0))
    val good = (1 to 300).map(i =>
      Assign("good", i * 1000L, 1000L + i, i % 2))
    val chunks = Seq(
      bad.take(100) ++ good.take(100),
      bad.slice(100, 200) ++ good.slice(100, 200),
      bad.drop(200) ++ good.drop(200))
    val dir = java.nio.file.Files.createTempDirectory("graft-srm")
    writeChunks(dir, chunks)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[Assign]
    val out = SrmMonitor.monitor(stream, alpha = 0.001)
    val (table, _) = graft.streaming.EventStream
      .runToCompletionAppendTracked(spark, out.toDF(), "graft_srm_mon")
    val got = table.as[Health].collect()
      .sortBy(h => (h.experiment, h.n0 + h.n1))

    // one emission per key per micro-batch, cumulative counts
    val badRows = got.filter(_.experiment == "bad")
    val goodRows = got.filter(_.experiment == "good")
    assert(badRows.map(h => h.n0 + h.n1).toSeq == Seq(100L, 200L, 300L))
    assert(goodRows.map(h => h.n0 + h.n1).toSeq == Seq(100L, 200L, 300L))
    // each emission equals the golden verdict on the cumulative counts
    (badRows ++ goodRows).foreach { h =>
      val g = SrmMonitor.verdict(h.experiment, h.n0, h.n1, h.nBad, 0.001)
      assert(h == g, s"emission $h != golden $g")
    }
    assert(badRows.last.srmFlag, "90/10 over 300 must flag")
    assert(goodRows.forall(!_.srmFlag), "50/50 must never flag")
    assert(badRows.last.n1 == 30 && badRows.last.n0 == 270)
  }

  test("Scala tail polynomial is bit-identical to the shared SQL text") {
    Seq(0.0, 0.5, 1.0, 1.959964, 2.575829, 3.3, 5.0, 8.5).foreach { z =>
      // CAST the probe literal: query call sites feed DOUBLE columns
      val sql = spark.sql(
        s"SELECT ${functions.PValues.twoSidedP(s"CAST($z AS DOUBLE)")} AS p")
        .collect()(0).getDouble(0)
      assert(java.lang.Double.compare(sql, SrmMonitor.twoSidedP(z)) == 0,
        s"z=$z: sql $sql != scala ${SrmMonitor.twoSidedP(z)}")
    }
  }

  test("streaming verdict on q314's final counts equals the batch row EXACTLY") {
    // verdict() applies the batch query's own output rounding (chi2
    // to 6 HALF_UP before the tail, p to 10), so chi2, p and the flag
    // are bit-identical — no rounding re-application needed here
    val batch = queries.StatsQueries.queries("q314_srm_check")(spark, sf)
      .collect()
    batch.foreach { r =>
      val g = SrmMonitor.verdict(r.getString(0), r.getLong(2),
        r.getLong(3), 0L, 0.001)
      assert(java.lang.Double.compare(g.chi2, r.getDouble(4)) == 0,
        s"${r.getString(0)}: chi2 ${g.chi2} != ${r.getDouble(4)}")
      assert(java.lang.Double.compare(g.pValue, r.getDouble(5)) == 0,
        s"${r.getString(0)}: p ${g.pValue} != ${r.getDouble(5)}")
      assert((r.getInt(6) == 1) == g.srmFlag)
    }
  }

  test("arms outside {0,1} land in nBad, never in arm 0") {
    // 50/50 stream polluted with arm=2 and arm=-1 rows: the split
    // stays balanced (no false flag) and the bad rows are counted
    val obs = (1 to 100).map(i => Assign("mix", i * 1000L, i.toLong, i % 2)) ++
      Seq(Assign("mix", 200000L, 900L, 2), Assign("mix", 201000L, 901L, -1),
        Assign("mix", 202000L, 902L, 7))
    val dir = java.nio.file.Files.createTempDirectory("graft-srm-bad")
    writeChunks(dir, Seq(obs))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[Assign]
    val out = SrmMonitor.monitor(stream, alpha = 0.001)
    val (table, _) = graft.streaming.EventStream
      .runToCompletionAppendTracked(spark, out.toDF(), "graft_srm_bad")
    val h = table.as[Health].collect().last
    assert(h.n0 == 50L && h.n1 == 50L && h.nBad == 3L, h.toString)
    assert(!h.srmFlag)
  }

  test("pre-nBad 16-byte state unpacks with nBad = 0") {
    assert(SrmMonitor.unpack(SrmMonitor.pack(7L, 9L, 0L)) == ((7L, 9L, 0L)))
    val legacy = {
      val bos = new java.io.ByteArrayOutputStream(16)
      val o = new java.io.DataOutputStream(bos)
      o.writeLong(7L); o.writeLong(9L); o.flush(); bos.toByteArray
    }
    assert(SrmMonitor.unpack(legacy) == ((7L, 9L, 0L)))
  }
}
