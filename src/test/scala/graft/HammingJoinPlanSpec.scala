package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.plans.{HammingBlocks, HammingJoinPlan}
import graft.queries.TextQueries

class HammingJoinPlanSpec extends SparkSpecBase {

  test("native hamming self-join plans HammingSelfJoinExec with no SQL-level shuffle") {
    val df = TextQueries.queries("q110_simhash_pairs_native")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HammingSelfJoin"), s"custom exec missing:\n$plan")
    // the one fan-out shuffle lives INSIDE the exec (RDD-level); the
    // SQL plan below the top-level orderBy must contain no Exchange,
    // no Window, no Join and no pair-set distinct
    val body = plan.split("HammingSelfJoin", 2)(1)
    assert(!body.contains("Exchange"), s"unexpected SQL shuffle below the exec:\n$plan")
    assert(!plan.contains("Window"), "fell back to the window formulation")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      "fell back to a join formulation")
  }

  test("native path equals the compositional simhash pair search") {
    val native = TextQueries.queries("q110_simhash_pairs_native")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val composed = TextQueries.queries("q32b_simhash_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(native.nonEmpty, "pair search found nothing — test data degenerate")
    assert(native == composed)
  }

  test("recall 1.0 on seeded bit flips at hamming <= 3") {
    import spark.implicits._
    // 500 planted near-dups: doc i's sig XOR a mask of <= 3 bits —
    // every (i, i + 10000) pair is at hamming <= 3 by construction and
    // MUST come back (pigeonhole guarantee, exercised end-to-end)
    val base = (0L until 500L).map { i =>
      (i, scala.util.hashing.MurmurHash3.stringHash(s"doc$i").toLong * 2654435761L)
    }
    val flipped = base.map { case (i, s) =>
      val nBits = (i % 4).toInt // 0..3 flips
      val sig = (0 until nBits).foldLeft(s) { (acc, k) =>
        acc ^ (1L << (((i * 7 + k * 13) % 64).toInt))
      }
      (i + 10000L, sig)
    }
    val sigs = (base ++ flipped).toDF("doc_id", "simhash")
    val pairs = HammingJoinPlan.simhashPairs(sigs, "doc_id", "simhash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missing = base.indices.filter { i =>
      val expectH = java.lang.Long.bitCount(base(i)._2 ^ flipped(i)._2)
      expectH <= 3 && !pairs.contains((base(i)._1, flipped(i)._1))
    }
    assert(missing.isEmpty, s"planted pairs missed: $missing")
  }

  test("pairs are emitted exactly once (local dedup across the 20 triples)") {
    import spark.implicits._
    // identical sigs match on ALL 20 triples — without the
    // first-matching-triple rule each pair would appear 20 times
    val sigs = (0L until 30L).map(i => (i, 0x0123456789abcdefL)).toDF("doc_id", "simhash")
    val rows = HammingJoinPlan.simhashPairs(sigs, "doc_id", "simhash")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size, "duplicate pairs emitted")
    assert(rows.length == 30 * 29 / 2) // under-cap bucket: all pairs
  }

  test("over-cap buckets degrade to linear chain pairs, connectivity preserved") {
    import spark.implicits._
    val n = 1000
    val sigs = (0L until n.toLong).map(i => (i, 0x7777000012345678L)).toDF("doc_id", "simhash")
    val pairs = HammingJoinPlan.simhashPairs(sigs, "doc_id", "simhash", maxBucket = 64)
    val collected = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    // linear, not quadratic: C(1000, 2) would be ~500k
    assert(collected.length < 3L * n, s"quadratic blowup: ${collected.length} pairs")
    // the chain still connects the whole group into one component
    val clusters = Dedup.connectedComponents(
        pairs.select(col("doc_a"), col("doc_b")))
      .select("cluster_id").distinct().count()
    assert(clusters == 1, s"mass-dup group fragmented into $clusters components")
  }

  test("firstMatchingTriple is defined for every pair at hamming <= 3") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val a = rnd.nextLong()
      val nBits = rnd.nextInt(4)
      val b = (0 until nBits).foldLeft(a)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
      val t = HammingBlocks.firstMatchingTriple(a, b)
      assert(t >= 0 && t < 20,
        s"pigeonhole violated for hamming ${java.lang.Long.bitCount(a ^ b)}")
    }
  }
}
