package graft

import org.apache.spark.sql.functions._
import graft.queries.OpsQueries

class OpsSpec extends SparkSpecBase {

  test("every ops query runs, keys match oracles") {
    OpsQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
    assert(OpsQueries.oracleSql.keySet == OpsQueries.queries.keySet)
  }

  test("train split is total, disjoint, and stable across runs") {
    val s1 = OpsQueries.queries("q52_train_split")(spark, sf)
    assert(s1.count() == Tables.documents(spark, sf).count())
    val again = OpsQueries.queries("q52_train_split")(spark, sf)
    assert(s1.exceptAll(again).count() == 0)
    val frac = s1.filter(col("split") === "holdout").count().toDouble / s1.count()
    assert(frac > 0.08 && frac < 0.30, s"holdout fraction $frac out of band")
  }

  test("range join pairs are symmetric-free and within the band") {
    val r = OpsQueries.queries("q51_range_join")(spark, sf)
    assert(r.filter(col("n_close_pairs") <= 0).count() == 0)
  }
}
