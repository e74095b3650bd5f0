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

  test("readWhere prunes files on z-ordered data with hash-identical results") {
    import graft.sources.SnapshotStats.StatsPred._
    val dir = tmp()
    // two independent uniform dimensions — the case where a 1-D sort
    // can only serve one of them and z-order serves both
    val df = spark.range(0, 20000).select(
      col("id").as("k"),
      (col("id") * 7919 % 100).as("a"),
      (col("id") * 104729 % 365).as("b"))
    Snapshot.publishZOrdered(df, dir, "a", "b", nFiles = 16)

    for (pred <- Seq(
        And(Between("a", 10L, 15L), Between("b", 40L, 70L)), // both dims
        Between("a", 3L, 4L),                                // first dim only
        Between("b", 100L, 120L),                            // second dim only
        EqualTo("a", 42L))) {
      val (kept, total) = Snapshot.pruneAudit(spark, dir, pred)
      assert(total == 16)
      assert(kept < total, s"selective $pred must prune (kept $kept/$total)")
      assert(kept > 0, s"$pred matches rows, pruning must keep files")
      val pruned = Snapshot.readWhere(spark, dir, pred)
        .as[(Long, Long, Long)].collect().toSet
      val full = Snapshot.read(spark, dir).filter(pred.toColumn)
        .as[(Long, Long, Long)].collect().toSet
      assert(pruned == full, s"pruned read diverged for $pred")
      assert(pruned.nonEmpty)
    }
    // a predicate outside the data's range prunes everything and
    // still returns a correct (empty) frame with the right schema
    val nothing = Between("a", 1000L, 2000L)
    assert(Snapshot.pruneAudit(spark, dir, nothing)._1 == 0)
    val empty = Snapshot.readWhere(spark, dir, nothing)
    assert(empty.columns.toSeq == Seq("k", "a", "b") && empty.count() == 0)
  }

  test("stats pruning handles strings, all-null files, and Or/IsNull soundly") {
    import graft.sources.SnapshotStats.StatsPred._
    val dir = tmp()
    // range-partition by the string key so files carry tight string
    // intervals; c is all-null exactly where s < "n" (file-aligned)
    val df = spark.range(0, 2600).select(
      concat(lit(""), chr(lit(97) + col("id") % 26), lpad(col("id").cast("string"), 5, "0")).as("s"),
      col("id").as("k"))
      .withColumn("c", when(col("s") >= "n", col("k")).otherwise(lit(null).cast("long")))
      .repartitionByRange(4, col("s"))
      .sortWithinPartitions(col("s"))
    Snapshot.publishStats(df, dir)

    val sPred = Between("s", "ba", "bz")
    val (kept, total) = Snapshot.pruneAudit(spark, dir, sPred)
    assert(total == 4 && kept == 1, s"string range must prune to 1 file, got $kept/$total")
    assert(Snapshot.readWhere(spark, dir, sPred).collect().toSet ==
      Snapshot.read(spark, dir).filter(sPred.toColumn).collect().toSet)

    // equality on c prunes the all-null files; IsNull keeps them
    val cEq = GtEq("c", 0L)
    val (keptC, _) = Snapshot.pruneAudit(spark, dir, cEq)
    assert(keptC < 4, "all-null-column files must prune for a value predicate")
    assert(Snapshot.readWhere(spark, dir, cEq).count() ==
      Snapshot.read(spark, dir).filter(col("c") >= 0L).count())
    val (keptN, _) = Snapshot.pruneAudit(spark, dir, IsNull("c"))
    assert(keptN >= 4 - keptC, "IsNull must keep the all-null files")
    assert(Snapshot.readWhere(spark, dir, IsNull("c")).count() ==
      Snapshot.read(spark, dir).filter(col("c").isNull).count())

    // Or widens: union of both sides' files, results identical
    val orPred = Or(sPred, Between("s", "ya", "yz"))
    assert(Snapshot.pruneAudit(spark, dir, orPred)._1 == 2)
    assert(Snapshot.readWhere(spark, dir, orPred).count() ==
      Snapshot.read(spark, dir).filter(orPred.toColumn).count())
  }

  test("readWhere degrades to a full filtered scan when no manifest exists") {
    import graft.sources.SnapshotStats.StatsPred._
    val dir = tmp()
    Snapshot.publish(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir)
    assert(Snapshot.pruneAudit(spark, dir, Between("k", 2L, 3L)) == ((0, 0)))
    assert(Snapshot.readWhere(spark, dir, Between("k", 2L, 3L))
      .as[(Long, String)].collect().toSet == Set((2L, "b"), (3L, "c")))
  }

  test("stats manifest round-trips special doubles and unicode strings") {
    import graft.sources.SnapshotStats
    import graft.sources.SnapshotStats.{ColStats, FileStats}
    val stats = Seq(
      FileStats("f1", 10L, Map(
        "d" -> ColStats("d", hasValue = true,
          Some(-0.0), Some(Double.PositiveInfinity), 0L),
        "s" -> ColStats("s", hasValue = true,
          Some("a\tb\nc"), Some("é中😀"), -1L),
        "n" -> ColStats("l", hasValue = false, None, None, 10L))),
      FileStats("f2", 0L, Map.empty))
    val rt = SnapshotStats.parseManifest(SnapshotStats.renderManifest(stats))
    assert(rt == stats)
    // -0.0 must round-trip as -0.0 (raw bits), not 0.0
    val d = rt.head.cols("d").min.get.asInstanceOf[Double]
    assert(java.lang.Double.doubleToRawLongBits(d) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
  }

  test("string pruning order matches Spark's UTF8String order, not UTF-16") {
    import graft.sources.SnapshotStats
    import org.apache.spark.unsafe.types.UTF8String
    // supplementary plane (surrogates in UTF-16) vs BMP char: the two
    // orders disagree here; pruning must follow Spark/parquet order
    val pairs = Seq(("a", "b"), ("é", "z"), ("😀", "�"),
      ("ab", "abc"), ("", "a"), ("中", "😀"))
    pairs.foreach { case (x, y) =>
      val expected = Integer.signum(
        UTF8String.fromString(x).compareTo(UTF8String.fromString(y)))
      assert(Integer.signum(SnapshotStats.cmp(x, y)) == expected,
        s"cmp('$x','$y') disagrees with UTF8String order")
    }
  }

  test("conditional commit: concurrent publishers land distinct generations, no torn state") {
    val dir = tmp()
    val dfA = spark.range(0, 500).select(col("id").as("k"), lit("writerA").as("who"))
    val dfB = spark.range(500, 900).select(col("id").as("k"), lit("writerB").as("who"))
    val results = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val threads = Seq("A" -> dfA, "B" -> dfB).map { case (name, df) =>
      new Thread(() => results.put(name, Snapshot.publishConditional(df, dir)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val gA = results.get("A"); val gB = results.get("B")
    assert(gA != gB, "CAS claim must fence generations — two writers cannot share one")
    assert(Set(gA, gB) == Set(1L, 2L))
    // each committed generation contains EXACTLY its writer's rows
    val atA = Snapshot.readAt(spark, dir, gA).as[(Long, String)].collect()
    assert(atA.length == 500 && atA.forall(_._2 == "writerA"))
    val atB = Snapshot.readAt(spark, dir, gB).as[(Long, String)].collect()
    assert(atB.length == 400 && atB.forall(_._2 == "writerB"))
    assert(Snapshot.currentGen(spark, dir).contains(2L))

    // crash debris: a claim without a commit fences its generation
    // number away from future writers and stays invisible to readers
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/gen=3/_CLAIM"), false).close()
    Seq((999L, "torn")).toDF("k", "who").write.parquet(s"$dir/gen=3/data-deadbeef")
    assert(Snapshot.currentGen(spark, dir).contains(2L),
      "claimed-but-uncommitted generation must not resolve")
    val g4 = Snapshot.publishConditional(
      spark.range(0, 10).select(col("id").as("k"), lit("writerC").as("who")), dir)
    assert(g4 == 4L, "conditional writers must claim above debris, not reuse it")
    assert(Snapshot.read(spark, dir).as[(Long, String)].collect().forall(_._2 == "writerC"))

    // conditional generations carry a stats manifest: readWhere prunes
    import graft.sources.SnapshotStats.StatsPred.Between
    assert(Snapshot.readWhere(spark, dir, Between("k", 3L, 5L)).count() == 3)
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

  test("bloom point-index prunes equality probes where min/max cannot, losslessly") {
    import graft.sources.SnapshotStats.StatsPred.{And => PAnd, Between, EqualTo, Or => POr}
    val dir = tmp()
    // keys striped mod 8 across 8 files: every file's [min,max] spans
    // nearly the whole domain (stats prune ~nothing for a point
    // probe), but each key lives in EXACTLY one file (bloom prunes to
    // ~1). The unclustered-high-cardinality shape the bloom tier is
    // FOR.
    val df = spark.range(0, 4000)
      .select(col("id").as("k"), (col("id") % 8).as("stripe"),
        concat(lit("u"), col("id")).as("u"))
      .repartitionByRange(8, col("stripe"))
    Snapshot.publishStatsIndexed(df, dir, bloomCols = Seq("k", "u"))
    val probe = EqualTo("k", 1337L)
    val (keptStats, total) = {
      // stats-only view of the same probe: count files whose range matches
      val gen = Snapshot.currentGen(spark, dir).get
      val stats = graft.sources.SnapshotStats
        .readManifest(spark, s"$dir/gen=$gen/_STATS.tsv").get
      (stats.count(probe.mayMatch), stats.size)
    }
    val (keptBloom, total2) = Snapshot.pruneAudit(spark, dir, probe)
    // range partitioner may pack 8 stripes into 4–8 files; the
    // invariants are layout-independent: stats keep EVERYTHING,
    // bloom keeps ~the one file holding the stripe
    assert(total >= 4 && total2 == total)
    assert(keptStats == total, "stripe layout should defeat min/max pruning")
    assert(keptBloom <= 2, s"bloom kept $keptBloom of $total files for a point probe")
    // lossless: pruned read ≡ full filtered scan
    val got = Snapshot.readWhere(spark, dir, probe).collect()
    assert(got.length == 1 && got.head.getAs[Long]("k") == 1337L)
    // string column probe through the same index
    val (keptU, _) = Snapshot.pruneAudit(spark, dir, EqualTo("u", "u2029"))
    assert(keptU <= 2)
    assert(Snapshot.readWhere(spark, dir, EqualTo("u", "u2029"))
      .collect().map(_.getAs[Long]("k")).toSeq == Seq(2029L))
    // absent value: no false negatives means result is exactly empty
    assert(Snapshot.readWhere(spark, dir, EqualTo("k", 999999L)).count() == 0)
    // Or is NOT a conjunct: bloom must not prune either branch away
    val either = POr(EqualTo("k", 10L), EqualTo("k", 17L))
    assert(Snapshot.readWhere(spark, dir, either).count() == 2)
    // equality under And composes with range pruning
    val both = PAnd(EqualTo("k", 1337L), Between("k", 0L, 4000L))
    assert(Snapshot.readWhere(spark, dir, both).count() == 1)
    // floating columns are rejected at publish (no stable render)
    intercept[IllegalArgumentException] {
      Snapshot.publishStatsIndexed(
        spark.range(2).select(col("id").cast("double").as("d")),
        tmp(), bloomCols = Seq("d"))
    }
  }

  test("compact rewrites into fewer files with identical content; sidecars survive") {
    import graft.sources.SnapshotStats.StatsPred.EqualTo
    val dir = tmp()
    val df = spark.range(0, 3000)
      .select(col("id").as("k"), (col("id") % 8).as("stripe"))
      .repartitionByRange(8, col("stripe"))
    val g1 = Snapshot.publishStatsIndexed(df, dir, bloomCols = Seq("k"))
    val before = Snapshot.read(spark, dir)
      .collect().map(_.toString).sorted
    val filesBefore = Snapshot.pruneAudit(spark, dir, EqualTo("k", 5L))._2
    val g2 = Snapshot.compact(spark, dir, targetFiles = 2)
    assert(g2 == g1 + 1, "compaction must publish a NEW generation")
    val after = Snapshot.read(spark, dir)
      .collect().map(_.toString).sorted
    assert(after.sameElements(before), "compaction changed the content")
    val (kept, total) = Snapshot.pruneAudit(spark, dir, EqualTo("k", 5L))
    assert(total <= 2 && total < filesBefore,
      s"compaction left $total files (was $filesBefore)")
    // the bloom sidecar was REBUILT for the new layout: a point probe
    // still prunes losslessly and an absent key reads empty
    assert(kept <= total)
    assert(Snapshot.readWhere(spark, dir, EqualTo("k", 5L)).count() == 1)
    assert(Snapshot.readWhere(spark, dir, EqualTo("k", 99999L)).count() == 0)
    // old generation still time-travels until vacuum
    assert(Snapshot.readAt(spark, dir, g1).count() == 3000)
  }
}
