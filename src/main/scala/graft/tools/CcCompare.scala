package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-12 head-to-head (judge ask #8): the production min-label +
  * folded-pointer-jumping CC ([[Dedup.connectedComponents]]) vs the
  * two-phase large-star/small-star alternative
  * ([[Dedup.connectedComponentsTwoPhase]]) on the q59 pair front over
  * a given corpus — typically the ~500k-doc stress corpus, whose
  * 1000-copy hot family produces exactly the chain-heavy shape the
  * two-phase algorithm targets. Prints rounds, wall seconds, shuffle
  * read/write bytes, and asserts LABEL PARITY (identical (doc_id,
  * cluster_id) sets) so the comparison can never quietly compare
  * different answers.
  *
  *   sbt "runMain graft.tools.CcCompare /tmp/graft_stress12"
  */
object CcCompare {

  private class Tally extends SparkListener {
    val read = new AtomicLong(0L)
    val write = new AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft_stress12")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_MEM", "48g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // the q59 front: LSH bands → bounded candidate pairs, persisted so
    // both contenders consume identical input without recomputing it
    val pairs = Dedup.lshCandidatePairs(
      Dedup.lshBandsMd5Narrow(docs, "doc_id", "text",
        shingleWidth = 3, nSeeds = 8, rowsPerBand = 4))
      .select(col("doc_a"), col("doc_b")).persist()
    println(s"[cc] pairs: ${pairs.count()}")

    def measure(name: String, run: DataFrame => DataFrame): (Long, DataFrame) = {
      spark.sparkContext.setJobGroup(name, name)
      val tally = new Tally
      spark.sparkContext.addSparkListener(tally)
      val t0 = System.nanoTime()
      val labels = run(pairs)
      labels.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus before detaching (Stress r11 fix)
      var last = (-1L, -1L); var stableMs = 0
      val d0 = System.currentTimeMillis()
      while (stableMs < 400 && System.currentTimeMillis() - d0 < 5000) {
        val cur = (tally.read.get, tally.write.get)
        if (cur == last) stableMs += 100 else { stableMs = 0; last = cur }
        Thread.sleep(100)
      }
      spark.sparkContext.removeSparkListener(tally)
      val rounds = Dedup.lastCcRounds.get()
      val sig = labels.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(doc_id, cluster_id))"), lit(0L))).head
      println(f"[cc] $name: rounds=$rounds seconds=$secs%.1f " +
        f"shuffle_read_mb=${tally.read.get / 1e6}%.1f shuffle_write_mb=${tally.write.get / 1e6}%.1f " +
        s"labels=${sig.getLong(0)} checksum=${sig.getLong(1)}")
      (sig.getLong(1), labels)
    }

    val (sigA, a) = measure("minlabel", p => Dedup.connectedComponents(p))
    val (sigB, b) = measure("twophase", p => Dedup.connectedComponentsTwoPhase(p))
    val diff = a.withColumnRenamed("cluster_id", "ca")
      .join(b.withColumnRenamed("cluster_id", "cb"), Seq("doc_id"), "full_outer")
      .filter(not(col("ca") <=> col("cb"))).count()
    println(s"[cc] label_parity=${diff == 0 && sigA == sigB} divergent_rows=$diff")
    require(diff == 0, s"CC variants disagree on $diff nodes")
    spark.stop()
  }
}
