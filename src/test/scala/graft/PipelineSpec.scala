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
    // the md5-bit kernels must agree with their SQL-built equivalents
    val m = spark.sql(
      "SELECT graft_md5_bands(array('a','b','c','d'), 3, 8, 4) AS bands, " +
        "graft_simhash_md5(array('a','b')) AS sh").first()
    assert(m.getSeq[String](0).length == 2)
    assert(m.getSeq[String](0).forall(_.matches("[0-9a-f]{32}")))
    assert(m.getLong(1) != 0L)
    // the KLL aggregate registers too (variadic quantile literals)
    val k = spark.sql(
      "SELECT graft_kll_quantiles(v, 100, 0.5) AS sk " +
        "FROM (SELECT CAST(id AS DOUBLE) AS v FROM range(1000))").first()
    val sk = k.getStruct(0)
    assert(sk.getLong(0) == 1000L)
    val med = sk.getSeq[org.apache.spark.sql.Row](2).head.getDouble(1)
    assert(math.abs(med - 500.0) < 30.0, s"median est $med")
  }

  test("GraftExtensions installs without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register both functions cleanly
  }

  test("pivot(list)+unnest round trip conserves every order exactly once") {
    val long = PipelineQueries.queries("q68_pivot_unnest")(spark, sf)
    val orders = Tables.orders(spark, sf)
    assert(long.count() == orders.count())
    assert(long.select("o_orderkey").distinct().count() == orders.count())
  }

  test("wide-matrix unpivot: 500-column DepMap-shape stack in one projection") {
    // the DepMap genes×cell-lines matrix arrives WIDE (t() in the
    // reference, tidy-web.R:12-21); stacking it must be one Generate
    // over one projection, not 500 unioned scans
    val nCols = 500
    val nRows = 200
    val wide = spark.range(nRows).toDF("gene_id")
      .select(col("gene_id") +:
        (0 until nCols).map(c =>
          ((col("gene_id") * nCols + c) % 97).cast("double").as(s"line_$c")): _*)
    val long = wide.unpivot(
      ids = Array(col("gene_id")),
      values = (0 until nCols).map(c => col(s"line_$c")).toArray,
      variableColumnName = "cell_line",
      valueColumnName = "effect")
    assert(long.count() == nRows.toLong * nCols)
    assert(long.select("cell_line").distinct().count() == nCols)
    // plan shape: a single Generate(Expand/Unpivot) stage, no Union
    val plan = long.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"wide unpivot planned as a union:\n${plan.take(2000)}")
  }

  test("pipeline oracle keys match") {
    assert(PipelineQueries.oracleSql.keySet == PipelineQueries.queries.keySet)
  }
}
