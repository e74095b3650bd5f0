package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-17 measurement harness (guide §1: measure first).
  *
  * For each named query: run it exactly the way Bench does (construction
  * + count(), clearCache after), and record
  *   - wall seconds (cold = first run, warm = second run),
  *   - Spark jobs / stages / tasks launched during the run (actions and
  *     iteration rounds show up here),
  *   - executed-plan Exchange count (deduped by plan id; AQE final),
  *   - `explain("formatted")` dumped to plans/r17/<query>_<tag>.txt.
  *
  *   sbt "runMain graft.tools.R17Probe before q91_pagerank,q59_dup_clusters"
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = args.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks); ()
      }
    })
    // warm codegen/JIT like Bench does
    Seq("q01_pricing_summary", "q34_cosine_topk").foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    Files.createDirectories(Paths.get("plans/r17"))
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def once(): (Double, Int, Int, Int) = {
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case e: Throwable =>
          println(s"[r17probe] $n FAILED: ${e.getMessage.take(200)}") }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // listener events are async; give the bus a beat before reading
        Thread.sleep(200)
        (dt, jobs.get(), stages.get(), tasks.get())
      }
      val (cold, cj, cs, ct) = once()
      val (warm, _, _, _) = once()
      // executed plan of a fresh construction (post-AQE needs an action,
      // so explain here shows the initial plan; still records shape)
      val df = fn(spark, sfDir)
      val expl = try df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"explain failed: $e" }
      val nEx = "Exchange ".r.findAllIn(expl).size
      Files.writeString(Paths.get(s"plans/r17/${n}_$tag.txt"), expl)
      println(f"[r17probe] $n%-28s cold=$cold%7.2fs warm=$warm%7.2fs " +
        f"jobs=$cj%4d stages=$cs%4d tasks=$ct%6d exchanges(initial)=$nEx%3d")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
