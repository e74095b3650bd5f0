package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc piecewise timing scratchpad for the optimization round. */
object Scratch {
  def t[A](name: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[scratch] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()

    val emb = graft.Tables.embeddings(spark, sfDir)
    t("dim probe") { emb.select(size(col("embedding"))).head.getInt(0) }
    val dim = 64
    val model = t("pca fit (1st)") { graft.operators.Pca.fit(emb, "embedding", dim) }
    t("pca fit (2nd)") { graft.operators.Pca.fit(emb, "embedding", dim) }
    t("moment agg only") {
      emb.agg(graft.functions.DecimalVectorSum.vectorSum(
        graft.functions.GraftFunctions.momentVector(col("embedding")),
        dim + dim * (dim + 1) / 2).as("m")).select(col("m.n")).head()
    }
    t("report") {
      graft.operators.Pca.componentReport(spark, model, 8).count()
    }
    // micro: what does one element of DecimalVectorBuffer.add cost?
    val xs = Array.tabulate(4290000)(i => math.sin(i) * 0.5)
    t("micro valueOf") {
      var s = 0L
      xs.foreach { x => s += java.math.BigDecimal.valueOf(x).scale() }
      s
    }
    t("micro valueOf+setScale") {
      var s = 0L
      xs.foreach { x =>
        s += java.math.BigDecimal.valueOf(x)
          .setScale(12, java.math.RoundingMode.HALF_UP).scale()
      }
      s
    }
    t("micro full add chain") {
      var acc = java.math.BigDecimal.ZERO
      xs.foreach { x =>
        acc = acc.add(java.math.BigDecimal.valueOf(x)
          .setScale(12, java.math.RoundingMode.HALF_UP))
      }
      acc
    }
    spark.stop()
  }
}
