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

    val docs = graft.Tables.documents(spark, sfDir)
    // q247 piecewise
    locally {
      import graft.functions.GraftFunctions
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") < 50)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      val sh = corpus.select(col("doc_id"),
          explode(GraftFunctions.shingleSet(
            GraftFunctions.normWords(col("text")), 3)).as("w"))
        .select(col("doc_id"),
          conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
        .distinct().persist()
      t("q247 sh count") { sh.count() }
      val docSets = sh.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n"), sort_array(collect_list(col("h"))).as("hs"))
        .persist()
      t("q247 docSets") { docSets.write.format("noop").mode("overwrite").save() }
      val dfc = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val pref = sh.join(dfc, "h")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
            .orderBy(col("df"), col("h"))))
        .join(docSets.select(col("doc_id"), col("n")), "doc_id")
        .filter(col("rn") <= col("n") - expr("(3 * n + 4) div 5") + 1)
        .select(col("doc_id"), col("h"), col("n")).persist()
      t("q247 pref") { pref.write.format("noop").mode("overwrite").save() }
      val cand = pref.as("pa")
        .join(pref.as("pb"), col("pa.h") === col("pb.h") &&
          col("pa.doc_id") < col("pb.doc_id"))
        .filter(col("pa.n") * 5 >= col("pb.n") * 3 &&
          col("pb.n") * 5 >= col("pa.n") * 3)
        .select(col("pa.doc_id").as("a"), col("pb.doc_id").as("b"))
        .distinct().persist()
      t("q247 cand") { println("cand rows=" + cand.count()) }
      t("q247 verify") {
        cand.join(docSets.select(col("doc_id").as("a"), col("n").as("na"),
            col("hs").as("ha")), "a")
          .join(docSets.select(col("doc_id").as("b"), col("n").as("nb"),
            col("hs").as("hb")), "b")
          .select(col("a"), col("b"),
            size(array_intersect(col("ha"), col("hb"))).cast("long").as("n_inter"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      ()
    }
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
