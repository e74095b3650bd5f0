package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing inspection: `sbt "runMain graft.tools.Profile <query> [sfDir]"`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // absorb JVM/session startup with an unrelated light query
    graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    // time construction + count together: queries with driver-side
    // iteration (CC) or synchronous streaming runs do their work at
    // construction, which is exactly what Bench measures
    val tc = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.count()
    println(s"cold_time=${(System.nanoTime()-tc)/1e9}s")
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"rows=$n warm_time=${(System.nanoTime()-t0)/1e9}s")
    df.explain("formatted")
    spark.stop()
  }
}
