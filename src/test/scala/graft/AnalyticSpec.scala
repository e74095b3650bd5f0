package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticQueries

class AnalyticSpec extends SparkSpecBase {

  test("every analytic query runs and returns rows at sf0.001") {
    AnalyticQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
    assert(AnalyticQueries.oracleSql.keySet == AnalyticQueries.queries.keySet)
  }

  test("rollup emits the grand-total row") {
    val r = AnalyticQueries.queries("q47_rollup")(spark, sf)
    val grand = r.filter(col("n_name").isNull && col("c_mktsegment").isNull)
    assert(grand.count() == 1)
    assert(grand.first().getAs[Long]("n_customers")
      == Tables.customer(spark, sf).count())
  }

  test("stratified sample is reproducible and rate-bounded per stratum") {
    val a = AnalyticQueries.queries("q72_stratified_sample")(spark, sf).collect().toSeq
    val b = AnalyticQueries.queries("q72_stratified_sample")(spark, sf).collect().toSeq
    assert(a == b, "hash sampling must be run-stable")
    // md5 first hex char is ~uniform: en keeps ~8/16, others ~3/16
    val total = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = AnalyticQueries.queries("q72_stratified_sample")(spark, sf)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.foreach { case (lang, k) =>
      val rate = k.toDouble / total(lang)
      val target = if (lang == "en") 0.5 else 3.0 / 16
      assert(math.abs(rate - target) < 0.15, s"$lang rate $rate vs target $target")
    }
  }

  test("z-scores have zero mean per group") {
    val z = AnalyticQueries.queries("q74_zscore")(spark, sf)
    val means = z.groupBy("lang").agg(avg(col("z")).as("m"))
    assert(means.filter(abs(col("m")) > 1e-4).count() == 0)
  }

  test("tfidf emits at most 3 terms per doc, ranked") {
    val t = graft.queries.TextQueries.queries("q73_tfidf")(spark, sf)
    val counts = t.groupBy("doc_id").count()
    assert(counts.filter(col("count") > 3).count() == 0)
    assert(t.filter(col("tfidf") < 0).count() == 0)
  }

  test("bigram-LM scores are positive and bigram counts match word counts") {
    val p = graft.queries.TextQueries.queries("q114_perplexity")(spark, sf)
    assert(p.filter(col("mean_nll") <= 0).count() == 0,
      "add-one smoothed NLL must be strictly positive (p < 1 for every bigram)")
    // n_bigrams == n_words - 1 for every doc that made it into the output
    val words = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.GraftFunctions.normWords(col("text"))).as("nw"))
    val bad = p.join(words, "doc_id")
      .filter(col("n_bigrams") =!= col("nw") - 1)
    assert(bad.count() == 0)
  }

  test("classifier filter is deterministic and kept matches the score sign") {
    val a = graft.queries.TextQueries.queries("q115_classifier_filter")(spark, sf)
    val b = graft.queries.TextQueries.queries("q115_classifier_filter")(spark, sf)
    assert(a.collect().toSeq == b.collect().toSeq, "hash-derived weights must be reproducible")
    assert(a.filter(col("kept") =!= (col("clf_score") > 0)).count() == 0)
    assert(a.filter(col("clf_score") < -1 || col("clf_score") > 1).count() == 0,
      "mean of per-word weights in [-1, 1) must stay in range")
    // the stand-in weights are hash-uniform: both classes must occur
    assert(a.filter(col("kept")).count() > 0 && a.filter(!col("kept")).count() > 0)
  }

  test("running total is monotone per customer") {
    val w = AnalyticQueries.queries("q48_window_frames")(spark, sf)
    import org.apache.spark.sql.expressions.Window
    val lagged = w.withColumn("prev",
      lag(col("running_total"), 1).over(
        Window.partitionBy("o_custkey").orderBy("order_seq")))
    assert(lagged.filter(col("prev") > col("running_total")).count() == 0)
  }
}
