package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticQueries, BehaviorQueries, OpsQueries}

/** Behavior/analytics batch: funnel ordering, retention cohorts,
  * hopping windows, grouping sets, regression, CDC diff.
  */
class BehaviorSpec extends SparkSpecBase {

  test("funnel stages are ordered: each stage's timestamp strictly follows the previous") {
    val f = BehaviorQueries.queries("q96_funnel")(spark, sf)
    assert(f.filter(col("funnel_stage") < 0 || col("funnel_stage") > 3).count() == 0)
    // stage k ⇔ exactly the first k stage-times are non-null, in order
    assert(f.filter(col("t_click_us").isNotNull &&
      (col("t_view_us").isNull || col("t_click_us") <= col("t_view_us"))).count() == 0)
    assert(f.filter(col("t_purchase_us").isNotNull &&
      (col("t_click_us").isNull || col("t_purchase_us") <= col("t_click_us"))).count() == 0)
    assert(f.count() > 0)
  }

  test("retention: every user appears in week 0 of their own cohort; offsets non-negative") {
    val r = BehaviorQueries.queries("q97_retention")(spark, sf)
    assert(r.filter(col("week_offset") < 0).count() == 0)
    val week0Users = r.filter(col("week_offset") === 0)
      .agg(sum(col("n_users"))).head().getLong(0)
    val allUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(week0Users == allUsers, s"week-0 covers $week0Users of $allUsers users")
  }

  test("hopping windows: every event lands in exactly two windows") {
    val w = BehaviorQueries.queries("q98_sliding_window")(spark, sf)
    val windowed = w.agg(sum(col("n_events"))).head().getLong(0)
    val events = Tables.events(spark, sf).count()
    assert(windowed == 2 * events, s"$windowed windowed rows vs $events events")
  }

  test("grouping sets emit exactly the three requested slices") {
    val g = AnalyticQueries.queries("q92_grouping_sets")(spark, sf)
    val byGid = g.groupBy(col("gid")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nations = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name")).distinct().count()
    val segments = Tables.customer(spark, sf).select(col("c_mktsegment")).distinct().count()
    // gid 1 = by nation (segment aggregated), 2 = by segment, 3 = grand total
    assert(byGid == Map(1L -> nations, 2L -> segments, 3L -> 1L), s"slices: $byGid")
  }

  test("regression slope reproduces a planted linear relationship") {
    import spark.implicits._
    val planted = (1 to 200)
      .map(i => ("X", i.toDouble, 3.0 * i + 7.0)).toDF("g", "x", "y")
      .withColumnRenamed("g", "l_returnflag")
      .withColumnRenamed("x", "l_quantity")
      .withColumnRenamed("y", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("graft-regr").toString
    planted.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val m = AnalyticQueries.queries("q95_regression")(spark, dir).head()
    assert(math.abs(m.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(m.getAs[Double]("intercept") - 7.0) < 1e-9)
  }

  test("snapshot diff classifies inserts/deletes/updates completely and disjointly") {
    val diff = OpsQueries.queries("q100_snapshot_diff")(spark, sf)
    val byType = diff.groupBy(col("change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = Tables.orders(spark, sf)
    val n = o.count()
    val inserts = o.filter(col("o_orderkey") % 10 === 3).count()
    val deletes = o.filter(col("o_orderkey") % 10 === 7).count()
    // updates: in both snapshots (key%10 ∉ {3,7}) and price bumped (key%5=0)
    val updates = o.filter(col("o_orderkey") % 10 =!= 3 &&
      col("o_orderkey") % 10 =!= 7 && col("o_orderkey") % 5 === 0).count()
    assert(byType.getOrElse("insert", 0L) == inserts, s"$byType vs inserts=$inserts")
    assert(byType.getOrElse("delete", 0L) == deletes, s"$byType vs deletes=$deletes")
    assert(byType.getOrElse("update", 0L) == updates, s"$byType vs updates=$updates")
    assert(!byType.contains("unchanged"))
    assert(n > 0)
  }

  test("preference pairs: chosen strictly outscores rejected by the margin, ids distinct") {
    val rows = BehaviorQueries.queries("q190_preference_pairs")(spark, sf).collect()
    assert(rows.nonEmpty, "no pairs mined at spec scale")
    rows.foreach { r =>
      val (cv, rv) = (r.getAs[Double]("chosen_value"), r.getAs[Double]("rejected_value"))
      assert(cv - rv >= 50.0 - 1e-9, s"margin violated: $cv vs $rv")
      assert(r.getAs[Long]("chosen_event_id") != r.getAs[Long]("rejected_event_id"),
        "a pair chose the same event twice")
      assert(r.getAs[Long]("n_candidates") >= 2L)
      assert(math.abs(r.getAs[Double]("margin") - math.rint((cv - rv) * 1e6) / 1e6) < 1e-9)
    }
    // the extremes really are the extremes: recompute per group
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"), col("value"))
      .groupBy("user_id", "day")
      .agg(max("value").as("mx"), min("value").as("mn"))
    val mined = BehaviorQueries.queries("q190_preference_pairs")(spark, sf)
    val bad = mined.join(ev, Seq("user_id", "day"))
      .filter(col("chosen_value") =!= col("mx") || col("rejected_value") =!= col("mn"))
      .count()
    assert(bad == 0, "a mined pair is not the per-group extreme")
  }

  test("q194 dialog audit: role algebra holds and a sequential golden fold agrees") {
    import org.apache.spark.sql.functions._
    val rows = BehaviorQueries.queries("q194_dialog_audit")(spark, sf).collect()
    assert(rows.nonEmpty, "no dialogs audited at spec scale")
    rows.foreach { r =>
      val (turns, nu, na) = (r.getAs[Long]("n_turns"),
        r.getAs[Long]("n_user"), r.getAs[Long]("n_assistant"))
      assert(nu + na == turns, s"role counts don't partition the turns: $r")
      val (viol, maxRun) = (r.getAs[Long]("n_violations"), r.getAs[Long]("max_run"))
      assert(maxRun >= 1L && maxRun <= turns)
      assert(viol >= 0L && viol <= turns - 1)
      // perfectly alternating <=> every run has length 1
      assert((viol == 0L) == (maxRun == 1L), s"violations/max_run disagree: $r")
      assert(r.getAs[Boolean]("valid") == (viol == 0L &&
        r.getAs[Boolean]("starts_user") && r.getAs[Boolean]("ends_assistant")))
    }
    // golden: per-user sequential fold over the ordered turn stream
    val userRoles = Set("view", "click", "signup")
    val ev = Tables.events(spark, sf)
      .orderBy(col("user_id"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), if (userRoles(r.getString(1))) "user" else "assistant"))
    val byUser = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
    val audited = rows.map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(audited.keySet == byUser.keySet.toSet)
    byUser.foreach { case (u, roles) =>
      val viol = roles.sliding(2).count { case Seq(a, b) => a == b; case _ => false }
      var (run, maxRun) = (0L, 0L)
      var prev = ""
      roles.foreach { ro =>
        run = if (ro == prev) run + 1 else 1L; prev = ro
        maxRun = math.max(maxRun, run)
      }
      val r = audited(u)
      assert(r.getAs[Long]("n_violations") == viol.toLong, s"user $u violations")
      assert(r.getAs[Long]("max_run") == maxRun, s"user $u max_run")
      assert(r.getAs[Boolean]("starts_user") == (roles.head == "user"))
      assert(r.getAs[Boolean]("ends_assistant") == (roles.last == "assistant"))
    }
  }

  test("q204 chat template: rendering reconciles with a sequential rebuild") {
    import org.apache.spark.sql.functions._
    val rows = BehaviorQueries.queries("q204_chat_template")(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild one dialog's template sequentially and compare the digest
    val userRoles = Set("view", "click", "signup")
    val ev = Tables.events(spark, sf)
      .orderBy(col("ts"), col("event_id"))
      .select(col("user_id"), col("event_id"), col("event_type")).collect()
    val byUser = ev.groupBy(_.getLong(0))
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val rebuilt = byUser(u).map { e =>
        val role = if (userRoles(e.getString(2))) "user" else "assistant"
        s"<|$role|>${e.getString(2)}#${e.getLong(1)}"
      }.mkString("")
      assert(r.getAs[Long]("n_turns") == byUser(u).length.toLong)
      assert(r.getAs[Long]("rendered_chars") == rebuilt.length.toLong,
        s"user $u rendered length")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(rebuilt.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("rendered_md5") == md5, s"user $u digest split")
    }
  }
}
