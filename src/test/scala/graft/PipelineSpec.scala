package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.queries.PipelineQueries

class PipelineSpec extends SparkSpecBase {

  test("annotation pipeline keeps the full key universe, one row per key") {
    val ann = PipelineQueries.queries("q27_annotation_pipeline")(spark, sf)
    val n = Tables.customer(spark, sf).select("c_custkey").distinct().count()
    assert(ann.count() == n)
    assert(ann.select("c_custkey").distinct().count() == n)
  }

  test("unpivot conserves the pivot totals") {
    val long = PipelineQueries.queries("q26_unpivot")(spark, sf)
    val total = long.agg(sum("n")).first().getLong(0)
    assert(total == Tables.orders(spark, sf).count())
  }

  test("sql-registered graft functions evaluate from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c, " +
        "graft_simhash64(array('a','b')) AS h").first()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) != 0L)
  }

  test("GraftExtensions installs without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register both functions cleanly
  }

  test("pipeline oracle keys match") {
    assert(PipelineQueries.oracleSql.keySet == PipelineQueries.queries.keySet)
  }
}
