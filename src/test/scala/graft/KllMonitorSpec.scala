package graft

import graft.streaming.KllMonitor
import graft.streaming.KllMonitor.{Obs, QuantEst}

/** Streaming KLL monitor invariants: cross-batch estimates track the
  * exact stream-so-far quantiles within the sketch's rank-error bar,
  * and state stays sketch-sized per key on a continuous domain where
  * the exact-histogram monitor would grow without bound.
  */
class KllMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeChunks(dir: java.nio.file.Path,
                          chunks: Seq[Seq[Obs]]): Unit =
    chunks.zipWithIndex.foreach { case (obs, i) =>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-kllm-c$i")
      obs.toDF().coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = scala.jdk.CollectionConverters
        .IteratorHasAsScala(java.nio.file.Files.list(stage).iterator()).asScala
        .find(_.toString.endsWith(".parquet")).get
      val dst = dir.resolve(f"chunk$i%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }

  test("3-batch continuous stream: final estimates within 3% rank of exact; state sketch-sized") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // continuous skewed values — every observation distinct, so an
      // exact histogram would hold 9000 state rows; the sketch holds
      // O(k log n)
      val all = (1 to 9000).map { i =>
        val u = (i * 2654435761L % 1000003).toDouble / 1000003.0
        Obs("lat", math.pow(u, 2) * 500.0 + i * 1e-9)
      }
      val chunks = all.grouped(3000).toSeq
      val dir = java.nio.file.Files.createTempDirectory("graft-kllm")
      writeChunks(dir, chunks)
      val schema = org.apache.spark.sql.Encoders.product[Obs].schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[Obs]
      val out = KllMonitor.monitor(stream, k = 200)
      val table = graft.streaming.EventStream
        .runToCompletionAppend(spark, out.toDF(), "graft_kll_mon")
        .as[QuantEst].collect()

      // one emission per micro-batch for the single key
      assert(table.length == 3, s"expected 3 emissions, got ${table.length}")
      val fin = table.maxBy(_.n)
      assert(fin.n == 9000L)
      assert(fin.retained < 9000 / 2,
        s"state must be sketch-sized, retained ${fin.retained}")

      val sorted = all.map(_.value).sorted
      def rankOf(v: Double): Double = sorted.count(_ <= v).toDouble / sorted.length
      for ((q, est) <- Seq((0.1, fin.p10), (0.5, fin.p50), (0.9, fin.p90))) {
        val err = math.abs(rankOf(est) - q)
        assert(err <= 0.03, s"q=$q est=$est rank err $err")
      }
      // intermediate emissions carry strictly growing n
      assert(table.map(_.n).sorted.toSeq == Seq(3000L, 6000L, 9000L))
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }
}
