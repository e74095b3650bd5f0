package graft.tools

import org.apache.spark.sql.SparkSession

/** Exchange-count probe for pinning ShuffleBudgetSpec budgets:
  * prints each named query's plan-string Exchange count under AQE on
  * AND off at sf0.001 (the spec's own scale and regex), so a new
  * query's budget is a measured number, not a guess.
  *
  *   sbt "runMain graft.tools.PlanCount q192_bleu_contam,q197_mmr_select"
  */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exchangeRe =
      ("Exchange hashpartitioning|Exchange rangepartitioning|" +
        "Exchange SinglePartition").r
    Seq(true, false).foreach { aqe =>
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      names.foreach { n =>
        spark.catalog.clearCache()
        val plan = graft.SparkEntry.queries(n)(spark, sf)
          .queryExecution.executedPlan.toString
        println(s"[plancount] aqe=$aqe $n ${exchangeRe.findAllIn(plan).size}")
      }
    }
    spark.stop()
  }
}
