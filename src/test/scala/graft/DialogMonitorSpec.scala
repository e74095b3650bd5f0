package graft

import org.apache.spark.sql.functions._

import graft.streaming.DialogMonitor
import graft.streaming.DialogMonitor.{Audit, Turn}

/** Streaming dialog-validity gate invariants: the cross-batch fold
  * equals a sequential golden fold, the FINAL per-dialog emission
  * agrees field-for-field with the batch audit (q194) over the same
  * turn stream, and state stays one row per dialog.
  */
class DialogMonitorSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeChunks(dir: java.nio.file.Path,
                          chunks: Seq[Seq[Turn]]): Unit =
    chunks.zipWithIndex.foreach { case (ts, i) =>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-dlg-c$i")
      ts.toDF().coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = scala.jdk.CollectionConverters
        .IteratorHasAsScala(java.nio.file.Files.list(stage).iterator()).asScala
        .find(_.toString.endsWith(".parquet")).get
      val dst = dir.resolve(f"chunk$i%02d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1100000000000L + i * 60000L))
    }

  private val turnSchema = org.apache.spark.sql.Encoders.product[Turn].schema

  private def withRocks[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  /** The real event log projected to turns — the same role rule as
    * q194, so the stream and the batch audit see identical dialogs. */
  private def eventTurns: Seq[Turn] =
    Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => Turn(r.getLong(0), r.getLong(1), r.getLong(2),
        if (Set("view", "click", "signup")(r.getString(3))) "user"
        else "assistant"))
      .sortBy(t => (t.tsMicros, t.id)).toSeq

  test("streaming audit ends exactly where the batch audit (q194) stands") {
    withRocks {
      val turns = eventTurns
      // three micro-batches, split mid-dialog on purpose
      val chunks = Seq(turns.take(turns.size / 3),
        turns.slice(turns.size / 3, 2 * turns.size / 3),
        turns.drop(2 * turns.size / 3))
      val dir = java.nio.file.Files.createTempDirectory("graft-dlg")
      writeChunks(dir, chunks)
      val stream = spark.readStream.schema(turnSchema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[Turn]
      val (table, progress) = graft.streaming.EventStream
        .runToCompletionAppendTracked(spark,
          DialogMonitor.monitor(stream).toDF(), "graft_dlg_mon")
      val got = table.as[Audit].collect()
      // final emission per dialog = the row with the max turn count
      val fin = got.groupBy(_.dialogId).view
        .mapValues(_.maxBy(_.nTurns)).toMap
      val batch = graft.queries.BehaviorQueries
        .queries("q194_dialog_audit")(spark, sf).collect()
      assert(fin.size == batch.length)
      batch.foreach { b =>
        val u = b.getAs[Long]("user_id")
        val a = fin(u)
        assert(a.nTurns == b.getAs[Long]("n_turns"), s"dialog $u turns")
        assert(a.nUser == b.getAs[Long]("n_user"), s"dialog $u user turns")
        assert(a.nAssistant == b.getAs[Long]("n_assistant"))
        assert(a.nViolations == b.getAs[Long]("n_violations"))
        assert(a.maxRun == b.getAs[Long]("max_run"), s"dialog $u max_run")
        assert(a.startsUser == b.getAs[Boolean]("starts_user"))
        // validSoFar covers everything the stream can know mid-flight
        assert(a.validSoFar ==
          (b.getAs[Long]("n_violations") == 0L && b.getAs[Boolean]("starts_user")))
      }
      // state: one row per dialog, never per turn
      val dialogs = turns.map(_.dialogId).distinct.size
      val rows = progress.map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(rows.nonEmpty && rows.max <= dialogs.toLong,
        s"state rows ${rows.max} exceed $dialogs dialogs")
    }
  }

  test("cross-batch fold equals the sequential golden fold; reversed arrival is re-ordered") {
    withRocks {
      val d1 = Seq(
        Turn(1L, 1000L, 1L, "user"), Turn(1L, 2000L, 2L, "assistant"),
        Turn(1L, 3000L, 3L, "assistant"), Turn(1L, 4000L, 4L, "user"),
        Turn(1L, 5000L, 5L, "assistant"))
      val d2 = Seq(
        Turn(2L, 1000L, 6L, "assistant"), Turn(2L, 2000L, 7L, "user"))
      val dir = java.nio.file.Files.createTempDirectory("graft-dlg-rev")
      // reversed within the batch — the processor must sort by (ts, id)
      writeChunks(dir, Seq((d1.take(3) ++ d2).reverse, d1.drop(3).reverse))
      val stream = spark.readStream.schema(turnSchema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString).as[Turn]
      val got = graft.streaming.EventStream
        .runToCompletionAppend(spark,
          DialogMonitor.monitor(stream).toDF(), "graft_dlg_rev")
        .as[Audit].collect().sortBy(a => (a.dialogId, a.nTurns))
      val golden =
        (DialogMonitor.fold(None, d1)._2 ++ DialogMonitor.fold(None, d2)._2)
          .sortBy(a => (a.dialogId, a.nTurns))
      assert(got.length == golden.length)
      got.zip(golden).foreach { case (g, e) => assert(g == e, s"$g != $e") }
      // d1: one violation (two assistants in a row), run of 2, starts user
      val last1 = golden.filter(_.dialogId == 1L).last
      assert(last1.nViolations == 1L && last1.maxRun == 2L && last1.startsUser)
      assert(!last1.validSoFar)
      // d2 opens with the assistant — never valid
      assert(golden.filter(_.dialogId == 2L).forall(!_.validSoFar))
    }
  }
}
