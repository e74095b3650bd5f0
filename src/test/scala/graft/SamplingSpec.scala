package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 sampling additions: q150 ticket-race weighted reservoir on
  * the native top-k operator, q151 temperature mixing.
  */
class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("q150: native ticket-race reservoir equals the window formulation") {
    val ticket = array_min(transform(
      sequence(lit(1), col("n_chars")),
      j => conv(substring(md5(concat(lit("q150:"),
        col("doc_id").cast("string"), lit(":"), j.cast("string"))),
        1, 12), 16, 10).cast("long")))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("neg_ticket", -ticket)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("neg_ticket").desc, col("doc_id"))
    val viaWindow = docs
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 20)
      .select("source", "doc_id", "rnk")
      .collect().map(_.toString).sorted.toSeq
    val viaNative = graft.plans.TopKPlan.topKPerKey(docs, Seq("source"),
        scoreCol = "neg_ticket", tieCol = "doc_id", k = 20)
      .select("source", "doc_id", "rnk")
      .collect().map(_.toString).sorted.toSeq
    assert(viaNative == viaWindow)
    assert(viaNative.nonEmpty)
  }

  test("q150: every source fills its reservoir (k or all docs), ranks contiguous") {
    val out = SparkEntry.queries("q150_reservoir_sample")(spark, sf)
    val perSource = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("maxr"),
        countDistinct(col("rnk")).as("nr"))
      .collect()
    val totalPerSource = Tables.documents(spark, sf)
      .groupBy("source").agg(count(lit(1)).as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { r =>
      val (src, n, maxr, nr) =
        (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3))
      assert(n == math.min(20L, totalPerSource(src)), s"$src reservoir size")
      assert(maxr.toLong == n && nr == n, s"$src ranks must be 1..$n")
    }
  }

  test("q151: temperature scaling flattens shares without reordering them") {
    val rows = SparkEntry.queries("q151_temperature_mix")(spark, sf)
      .select("source", "share_raw", "share_temp", "keep_rate", "src_chars",
        "expected_chars")
      .collect()
    val raw = rows.map(_.getDouble(1))
    val temp = rows.map(_.getDouble(2))
    assert(math.abs(raw.sum - 1.0) < 1e-4 && math.abs(temp.sum - 1.0) < 1e-4)
    // α = 0.5 compresses toward uniform: the biggest source shrinks,
    // the smallest grows, and relative order is preserved
    assert(temp.max <= raw.max + 1e-9 && temp.min >= raw.min - 1e-9)
    assert(raw.zip(temp).sortBy(_._1).map(_._2).sameElements(temp.sorted))
    rows.foreach { r =>
      assert(r.getDouble(3) <= 1.0 + 1e-9, "keep_rate caps at 1")
      assert(r.getDouble(5) <= r.getLong(4) + 1e-6, "can't keep more than exists")
    }
  }
}
