package graft

import org.apache.spark.sql.functions._

import graft.sources.Snapshot

/** Commit-marker snapshot protocol: readers see only complete
  * committed generations; crashed publishes are invisible; time
  * travel and vacuum respect the commit boundary.
  */
class SnapshotSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-snap").toString

  test("publish/read round-trips; later publish supersedes") {
    val dir = tmp()
    val g1 = Snapshot.publish(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir)
    assert(g1 == 1L)
    assert(Snapshot.read(spark, dir).count() == 2)
    val g2 = Snapshot.publish(Seq((1, "a2")).toDF("k", "v"), dir)
    assert(g2 == 2L)
    assert(Snapshot.read(spark, dir).count() == 1)
    assert(Snapshot.currentGen(spark, dir).contains(2L))
  }

  test("a crashed publish (data without marker) is invisible to readers") {
    val dir = tmp()
    Snapshot.publish(Seq((1, "a")).toDF("k", "v"), dir)
    // simulate a writer that died after the data write, before commit
    Seq((9, "torn")).toDF("k", "v")
      .write.parquet(s"$dir/gen=2/data")
    assert(Snapshot.currentGen(spark, dir).contains(1L),
      "uncommitted generation must not resolve")
    assert(Snapshot.read(spark, dir).as[(Int, String)].collect().toSet ==
      Set((1, "a")))
    // a retry publishes a FRESH generation above the debris
    val g = Snapshot.publish(Seq((2, "ok")).toDF("k", "v"), dir)
    assert(g == 2L) // retry reuses the torn slot: data dir overwritten, then committed
    assert(Snapshot.read(spark, dir).as[(Int, String)].collect().toSet ==
      Set((2, "ok")))
  }

  test("time travel reads any committed generation; vacuum keeps the window") {
    val dir = tmp()
    (1 to 4).foreach(i => Snapshot.publish(Seq((i, s"v$i")).toDF("k", "v"), dir))
    assert(Snapshot.readAt(spark, dir, 2).as[(Int, String)].head() == ((2, "v2")))
    Snapshot.vacuum(spark, dir, keep = 2)
    assert(Snapshot.currentGen(spark, dir).contains(4L))
    assert(Snapshot.readAt(spark, dir, 3).count() == 1)
    intercept[IllegalArgumentException] {
      Snapshot.readAt(spark, dir, 2)
    }
    // current read unaffected
    assert(Snapshot.read(spark, dir).as[(Int, String)].head() == ((4, "v4")))
  }
}
