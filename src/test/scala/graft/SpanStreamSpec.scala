package graft

import org.apache.spark.sql.functions._

import graft.streaming.SpanStream

/** Round-8 streaming span-dedup: cross-batch shifted-span detection,
  * crash-replay safety, and generational compaction.
  */
class SpanStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def uniq(seed: Int, n: Int): String =
    (0 until n).map(i => s"u${seed}_$i").mkString(" ")

  test("unseeded index dir: first batch treats the index as empty") {
    // seedIndex never called — the empty dir must not crash schema
    // inference; batch 0 probes against an empty index (all clean)
    // and still appends its own generation.
    val rows = Seq((1L, uniq(21, 30)), (2L, uniq(22, 30)))
    val srcDir = java.nio.file.Files.createTempDirectory("graft-span-unseeded-src")
    val stage = java.nio.file.Files.createTempDirectory("graft-span-unseeded-stage")
    rows.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = scala.jdk.CollectionConverters.IteratorHasAsScala(
      java.nio.file.Files.list(stage).iterator()).asScala
      .find(_.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, srcDir.resolve("chunk00.parquet"))
    val indexDir = java.nio.file.Files.createTempDirectory("graft-span-unseeded-idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-span-unseeded-out").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-span-unseeded-ckpt").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    SpanStream.run(stream, indexDir, outDir, ckptDir, "doc_id", "text")
    val v = spark.read.parquet(outDir)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(v == Map(1L -> "clean", 2L -> "clean"), s"got $v")
    assert(spark.read.parquet(indexDir).count() > 0, "batch gen must append")
  }

  test("streaming span index flags shifted spans across batches, replay-safe") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    // a corpus doc long enough to donate a 25-token span
    val donor = docs.withColumn("n", size(split(col("text"), " ")))
      .filter(col("n") >= 30).orderBy(col("doc_id")).first()
    val donorId = donor.getLong(0)
    val span = donor.getString(1).split(" ").filter(_.nonEmpty).take(25).mkString(" ")

    val corpus = docs
    // chunk 1: two fresh docs + one carrying the corpus span at a
    // SHIFTED offset (offset 3 — winnowing, not grid, must catch it);
    // chunk 2: a doc copying a span INTRODUCED in chunk 1 (cross-batch)
    val chunk1Span = uniq(11, 22) // 22 fresh tokens introduced in batch 0
    val chunks: Seq[Seq[(Long, String)]] = Seq(
      Seq((900001L, uniq(1, 40)),
        (900002L, uniq(2, 3) + " " + span + " " + uniq(3, 15)),
        (900003L, chunk1Span + " " + uniq(4, 20))),
      Seq((900004L, uniq(5, 7) + " " + chunk1Span),
        (900005L, uniq(6, 40))))

    val srcDir = java.nio.file.Files.createTempDirectory("graft-span-src")
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-span-chunk$i")
      rows.toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = scala.jdk.CollectionConverters.IteratorHasAsScala(
        java.nio.file.Files.list(stage).iterator()).asScala
        .find(_.toString.endsWith(".parquet")).get
      val dst = srcDir.resolve(f"chunk$i%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1100000000000L + i * 60000L))
    }
    val indexDir = java.nio.file.Files.createTempDirectory("graft-span-idx").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-span-out").toString
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-span-ckpt").toString
    SpanStream.seedIndex(corpus, indexDir, "doc_id", "text")
    // crash strictly between batch 0's two writes: its index gen
    // exists from the failed attempt; the replay must not self-flag
    graft.operators.Dedup.winnowDocFingerprints(
        chunks.head.toDF("doc_id", "text"), "doc_id", "text")
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_min"))
      .write.mode("overwrite").parquet(s"$indexDir/gen=0")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    SpanStream.run(stream, indexDir, outDir, ckptDir, "doc_id", "text")

    val v = spark.read.parquet(outDir)
      .select("doc_id", "status", "earliest_holder", "n_shared", "n_fps")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getLong(3), r.getLong(4))).toMap
    assert(v.size == 5)
    // fresh docs are clean with fingerprints present
    assert(v(900001L)._1 == "clean" && v(900001L)._4 > 0)
    assert(v(900005L)._1 == "clean")
    // crash-replay safety: 900003 introduces chunk1Span — its own
    // poisoned gen=0 must not flag it against itself
    assert(v(900003L)._1 == "clean", s"self-flagged on replay: ${v(900003L)}")
    // shifted corpus span caught, attributed to the donor or earlier
    assert(v(900002L)._1 == "dup_spans" && v(900002L)._2.exists(_ <= donorId),
      s"shifted span missed: ${v(900002L)}")
    // cross-batch: 900004 copies a span the seed never saw
    assert(v(900004L)._1 == "dup_spans" && v(900004L)._2.contains(900003L),
      s"cross-batch span missed: ${v(900004L)}")

    // compaction folds generations, probe verdicts preserved
    val preRows = spark.read.parquet(indexDir).count()
    val preFps = spark.read.parquet(indexDir).select("fp").distinct().count()
    assert(preRows > preFps)
    SpanStream.compactIndex(spark, indexDir)
    val compacted = spark.read.parquet(indexDir)
    assert(compacted.count() == preFps)
    // (the compacted index now holds chunk 1's own fingerprints, so a
    // reprobe self-matches — verdicts must still attribute correctly:
    // the cross-batch span to its chunk-0 introducer, a unique doc
    // only to itself)
    val reprobe = SpanStream.probeBatch(
        compacted.groupBy(col("fp")).agg(min(col("doc_min")).as("doc_min")),
        chunks(1).toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "earliest_holder")
      .as[(Long, Option[Long])].collect().toMap
    assert(reprobe(900004L).contains(900003L))
    assert(reprobe(900005L).contains(900005L))
  }
}
