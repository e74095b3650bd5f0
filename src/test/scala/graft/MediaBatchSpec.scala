package graft

import org.apache.spark.sql.functions._

import graft.operators.Selection

/** Aspect bucketing + grouped prefix sum (q172). The oracle pins the
  * end-to-end hashes; these pin the SCALE-SHAPE contract: the grouped
  * prefix sum is partition-count-independent and never routes a whole
  * group through one window task.
  */
class MediaBatchSpec extends SparkSpecBase {
  import spark.implicits._

  test("groupedPrefixSum: cumulative totals within each group, partition-count-independent") {
    val df = (1 to 100).map(i => (i.toLong, (i % 3).toString, i.toLong % 7 + 1))
      .toDF("id", "grp", "w")
    def run(parts: Int) =
      Selection.groupedPrefixSum(df.repartition(parts),
        Seq(col("grp")), Seq(col("id")), col("w"), numPartitions = parts)
        .select("grp", "id", "cum_weight")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val a = run(1)
    assert(a === run(4))
    assert(a === run(13))
    // golden check vs a driver-side scan
    val expect = (1 to 100).groupBy(_ % 3).flatMap { case (g, ids) =>
      var cum = 0L
      ids.sorted.map { i => cum += i % 7 + 1; (g.toString, i.toLong, cum) }
    }.toSet
    assert(a === expect)
  }

  test("q172: batches are contiguous within bucket, sized B except the tail") {
    val rows = SparkEntry.queries("q172_aspect_batch")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Int]("bucket")).foreach { case (_, batches) =>
      val sorted = batches.sortBy(_.getAs[Long]("batch_id"))
      // batch ids dense from 0; every batch but the last holds exactly 16
      assert(sorted.map(_.getAs[Long]("batch_id")).toSeq ===
        (0L until sorted.length).toSeq)
      sorted.dropRight(1).foreach(b => assert(b.getAs[Long]("n_items") === 16L))
      assert(sorted.last.getAs[Long]("n_items") <= 16L)
      // packing in doc order: batch k's last_doc < batch k+1's first_doc
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("last_doc") < y.getAs[Long]("first_doc"))
        case _ => ()
      }
    }
  }

  test("aspect argmin is exact: square, landscape, portrait, and tie cases") {
    // replicate the ladder arithmetic on hand-picked dims
    def bucketOf(w: Long, h: Long): Int = {
      val scores = Seq(
        (math.abs(w * 1 - h * 1) * 144, 0), (math.abs(w * 3 - h * 4) * 48, 1),
        (math.abs(w * 4 - h * 3) * 36, 2), (math.abs(w * 9 - h * 16) * 16, 3),
        (math.abs(w * 16 - h * 9) * 9, 4))
      scores.min._2
    }
    assert(bucketOf(100, 100) === 0)
    assert(bucketOf(400, 300) === 1) // w/h = 4/3 → the (4,3) bucket exactly
    assert(bucketOf(300, 400) === 2)
    assert(bucketOf(1600, 900) === 3)
    assert(bucketOf(900, 1600) === 4)
  }

  test("q191 storyboard: sample counts, sheet packing, and stride bounds all reconcile") {
    val rows = SparkEntry.queries("q191_video_storyboard")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nf, ns, nsamp) = (r.getAs[Long]("n_frames"), r.getAs[Long]("n_scenes"),
        r.getAs[Long]("n_samples"))
      assert(ns == (nf + 95) / 96 || ns == (nf + 99) / 100 || ns == (nf + 119) / 120,
        s"n_scenes $ns inconsistent with n_frames $nf for any ladder fps")
      // ≤ 4 samples per scene, ≥ 1 per scene
      assert(nsamp >= ns && nsamp <= 4 * ns, s"$nsamp samples vs $ns scenes")
      assert(r.getAs[Long]("first_frame") == 0L, "first sampled frame is scene 0 start")
      assert(r.getAs[Long]("last_frame") < nf, "sampled frame beyond the video")
      val sheets = r.getAs[Long]("n_sheets")
      val pad = r.getAs[Long]("last_sheet_pad")
      assert(sheets == (nsamp + 15) / 16 && (nsamp + pad) % 16 == 0,
        "contact-sheet packing arithmetic broken")
    }
  }

  test("q213 clip alignment: every planted mixup recovered, every control aligned") {
    val rows = SparkEntry.queries("q213_clip_align")(spark, sf).collect()
    assert(rows.nonEmpty)
    val maxId = rows.map(_.getAs[Long]("img_id")).max
    val (planted, controls) = rows.partition(_.getAs[Long]("img_id") % 17 == 5)
    assert(planted.nonEmpty && controls.nonEmpty)
    planted.foreach { r =>
      val id = r.getAs[Long]("img_id")
      // the last id has no successor embedding only when id+1 is past
      // the corpus; the inner source join already dropped that case
      assert(r.getAs[Boolean]("is_mismatch"), s"planted mixup $id not flagged")
      assert(r.getAs[Long]("best_id") == id + 1,
        s"mixup $id must recover its true caption ${id + 1}, got ${r.getAs[Long]("best_id")}")
    }
    controls.foreach { r =>
      val id = r.getAs[Long]("img_id")
      assert(!r.getAs[Boolean]("is_mismatch"), s"control pair $id falsely flagged")
      assert(r.getAs[Long]("best_id") == id)
      assert(r.getAs[Double]("best_cos") == r.getAs[Double]("own_cos"))
    }
    // alignment scores discriminate: the worst aligned control beats
    // the best mixed-up pair's own-caption score
    val minControlOwn = controls.map(_.getAs[Double]("own_cos")).min
    val maxPlantedOwn = planted.map(_.getAs[Double]("own_cos")).max
    assert(minControlOwn > maxPlantedOwn,
      s"alignment score fails to separate: control min $minControlOwn vs planted max $maxPlantedOwn")
    assert(maxId < 170, "audit slice must stay bounded")
  }
}
