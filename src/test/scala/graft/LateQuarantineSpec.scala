package graft

import org.apache.spark.sql.functions._

import graft.streaming.LateQuarantine

/** §2.4 #45x — the dead-letter contract: out ⊎ quarantine ≡ input,
  * verdicts follow the strictly-earlier-batches watermark, and a full
  * checkpoint-loss replay rewrites byte-identical generations.
  */
class LateQuarantineSpec extends SparkSpecBase {

  // (event_id, ts seconds or null) per chunk; replay order is pinned
  // by file mtimes, one file per micro-batch.
  private val chunks: Seq[Seq[(Long, Option[Long])]] = Seq(
    Seq((1L, Some(100L)), (2L, Some(200L))),              // b0: no wm yet
    Seq((3L, Some(150L)), (4L, Some(20L)), (5L, Some(300L))), // b1: wm=200
    Seq((6L, None), (7L, Some(290L))),                    // b2: wm=300, null ts
    Seq((8L, Some(230L)), (9L, Some(310L))))              // b3: wm=300

  private def stageChunks(tag: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag")
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-$tag-c$i")
      rows.toDF("event_id", "sec")
        .select(col("event_id"), col("sec").cast("timestamp").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = scala.jdk.CollectionConverters.IteratorHasAsScala(
        java.nio.file.Files.list(stage).iterator()).asScala
        .find(_.toString.endsWith(".parquet")).get
      val dst = dir.resolve(f"chunk$i%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1100000000000L + i * 60000L))
    }
    dir.toString
  }

  private def runGate(src: String, base: java.nio.file.Path): Unit = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    LateQuarantine.run(stream, s"$base/wm", s"$base/out", s"$base/quar",
      s"$base/ckpt", "ts", toleranceSec = 60L)
  }

  test("no row is ever lost: out and quarantine partition the input exactly") {
    val src = stageChunks("lq-part")
    val base = java.nio.file.Files.createTempDirectory("graft-lq1")
    LateQuarantine.initLedger(spark, s"$base/wm")
    runGate(src, base)
    val out = spark.read.parquet(s"$base/out").select("event_id")
    val quar = spark.read.parquet(s"$base/quar").select("event_id")
    val all = out.unionByName(quar).as[Long](spark.implicits.newLongEncoder)
      .collect().sorted
    assert(all.toSeq == (1L to 9L), s"partition broken: ${all.mkString(",")}")
    assert(out.intersect(quar).isEmpty, "a row landed in both sinks")
  }

  test("verdicts follow the strictly-earlier watermark; lateness is stamped exactly") {
    val src = stageChunks("lq-verdict")
    val base = java.nio.file.Files.createTempDirectory("graft-lq2")
    LateQuarantine.initLedger(spark, s"$base/wm")
    runGate(src, base)
    val quar = spark.read.parquet(s"$base/quar")
      .select("event_id", "watermark_sec", "lateness_sec").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    // b1: wm=200, cutoff 140 → event 4 (ts 20) late by 120; event 3
    // (ts 150) on time. b2: wm=300, null ts → quarantined, lateness
    // NULL. b3: wm=300, cutoff 240 → event 8 (ts 230) late by 10;
    // event 9 on time.
    assert(quar == Set(
      (4L, Some(200L), Some(120L)),
      (6L, Some(300L), None),
      (8L, Some(300L), Some(10L))), s"got $quar")
    // watermark ledger is monotone and one row per batch
    val wms = spark.read.parquet(s"$base/wm")
      .filter(col("batch") >= 0).orderBy(col("batch"))
      .select("wm").collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(wms.toSeq == Seq(200L, 300L, 300L, 310L), s"wm ledger: ${wms.mkString(",")}")
  }

  test("checkpoint loss replays every generation byte-identically (exactly-once)") {
    val src = stageChunks("lq-replay")
    val base = java.nio.file.Files.createTempDirectory("graft-lq3")
    LateQuarantine.initLedger(spark, s"$base/wm")
    runGate(src, base)
    def snap(): (Set[(Long, Long)], Set[(Long, Option[Long])]) = (
      spark.read.parquet(s"$base/out").select("event_id", "batch").collect()
        .map(r => (r.getLong(0), r.getAs[Number]("batch").longValue())).toSet,
      spark.read.parquet(s"$base/quar").select("event_id", "lateness_sec")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet)
    val before = snap()
    // lose the checkpoint → the whole stream replays over the SAME
    // sink dirs; per-batch overwrite must reproduce identical content
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$base/ckpt"))
    runGate(src, base)
    assert(snap() == before, "replay after checkpoint loss diverged")
  }
}
