package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc A/B of the winnow kernel vs the compositional spelling on
  * long synthetic docs: `sbt "runMain graft.tools.WinnowBench"`. */
object WinnowBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // 20k docs x 1000 tokens, 5% shared boilerplate block
    val boiler = (0 until 60).map(i => s"boiler_$i").mkString(" ")
    val docs = spark.range(20000).select(col("id").as("doc_id"),
      concat_ws(" ",
        when(col("id") % 20 === 0, lit(boiler)).otherwise(lit("")),
        concat_ws(" ", (0 until 1000).map(j =>
          md5(concat(col("id").cast("string"), lit(s":$j"))).substr(1, 6)): _*))
        .as("text")).persist()
    docs.count()
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime(); val n = df.count()
      println(f"$tag%-10s rows=$n%-6d ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    time("warmup")(graft.operators.Dedup.winnowedFingerprints(docs, "doc_id", "text"))
    time("kernel")(graft.operators.Dedup.winnowedFingerprints(docs, "doc_id", "text"))
    time("composed")(graft.operators.Dedup.winnowedFingerprintsComposed(docs, "doc_id", "text"))
    time("kernel")(graft.operators.Dedup.winnowedFingerprints(docs, "doc_id", "text"))
    time("composed")(graft.operators.Dedup.winnowedFingerprintsComposed(docs, "doc_id", "text"))
    spark.stop()
  }
}
