package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrderOps
import graft.operators.Layout

/** Z-order layout: the Morton key must interleave correctly and the
  * clustered write must give two-dimensional file-skipping.
  */
class LayoutSpec extends SparkSpecBase {

  test("morton spread/interleave round-trips bit patterns") {
    assert(ZOrderOps.interleave(0, 0) == 0L)
    assert(ZOrderOps.interleave(1, 0) == 1L) // a's bits at even positions
    assert(ZOrderOps.interleave(0, 1) == 2L) // b's bits at odd positions
    assert(ZOrderOps.interleave(3, 3) == 15L)
    // spot-check: de-interleaving recovers both inputs
    val (a, b) = (0xabcd, 0x1234)
    val z = ZOrderOps.interleave(a, b)
    def unspread(x: Long): Int = {
      var v = x & 0x5555555555555555L
      v = (v | (v >> 1)) & 0x3333333333333333L
      v = (v | (v >> 2)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v >> 4)) & 0x00ff00ff00ff00ffL
      v = (v | (v >> 8)) & 0x0000ffff0000ffffL
      v = (v | (v >> 16)) & 0xffffffffL
      v.toInt
    }
    assert(unspread(z) == a && unspread(z >> 1) == b)
  }

  test("withZKey survives epoch-scale long ranges (no Long overflow in norm16)") {
    import spark.implicits._
    // range ~9.2e18 (full positive Long span): (v-mn)*65535 overflows
    // Long by ~6e23 — the decimal(38,0) path must stay exact.
    val lo = 0L
    val hi = Long.MaxValue - 1
    val mid = hi / 2
    val df = Seq((lo, 1L), (mid, 1L), (hi, 1L)).toDF("t", "k")
    val z = Layout.withZKey(df, "t", "k")
      .orderBy(col("t")).select(col("t"), col("__z")).collect()
    val zs = z.map(_.getLong(1))
    // second dim is constant (norm 0) → z must equal interleave(norm_t, 0)
    // with the exact BigInt normalization — overflow would produce garbage
    val norm = (v: Long) => ((BigInt(v) - lo) * 65535 / (BigInt(hi) - lo)).toInt
    assert(zs(0) == ZOrderOps.interleave(norm(lo), 0))
    assert(zs(1) == ZOrderOps.interleave(norm(mid), 0))
    assert(zs(2) == ZOrderOps.interleave(norm(hi), 0))
    assert(zs(0) < zs(1) && zs(1) < zs(2), s"z keys not monotone: ${zs.mkString(",")}")
  }

  test("z-ordered files prune on BOTH dimensions; 1-D sort prunes only its own") {
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    val zDir = java.nio.file.Files.createTempDirectory("graft-z").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft-s").toString
    Layout.zorderWrite(li, zDir, "l_partkey", "l_suppkey", nFiles = 8)
    // baseline: range-sorted by partkey only, same file count
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(sDir)

    val zPart = Layout.fileSpread(spark, zDir, "l_partkey")
    val zSupp = Layout.fileSpread(spark, zDir, "l_suppkey")
    val sPart = Layout.fileSpread(spark, sDir, "l_partkey")
    val sSupp = Layout.fileSpread(spark, sDir, "l_suppkey")

    // the 1-D sort is near-perfect on its own column and useless on the other
    assert(sPart < 0.35, s"sorted layout should cluster partkey, spread $sPart")
    assert(sSupp > 0.8, s"sorted layout cannot cluster suppkey, spread $sSupp")
    // z-order clusters BOTH dimensions materially better than no clustering
    assert(zPart < 0.6, s"z-order partkey spread $zPart")
    assert(zSupp < 0.6, s"z-order suppkey spread $zSupp")
    assert(zSupp < sSupp / 1.5, s"z-order must beat 1-D sort on the second dim: $zSupp vs $sSupp")
  }

  test("hilbert index: bijective and every consecutive pair of cells is adjacent") {
    import graft.functions.HilbertOps
    // full 16×16 grid: xy2d must be a bijection onto 0..255, and the
    // curve's defining property must hold — consecutive indices are
    // Manhattan-distance-1 neighbors (Morton violates this at every
    // quadrant seam; Hilbert never does)
    val bits = 4
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n)
      yield (HilbertOps.xy2d(x, y, bits), (x, y))
    val byD = cells.sortBy(_._1)
    assert(byD.map(_._1) == (0L until (n.toLong * n)).toIndexedSeq,
      "xy2d is not a bijection onto the grid")
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"cells d and d+1 not adjacent: ($x1,$y1) -> ($x2,$y2)")
    }
    // and the 16-bit production form agrees with the generic transform
    assert(HilbertOps.hilbert16(0xabcd, 0x1234) == HilbertOps.xy2d(0xabcd, 0x1234, 16))
  }

  test("hilbert layout prunes at least as well as morton on both dimensions") {
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
    val zDir = java.nio.file.Files.createTempDirectory("graft-z2").toString
    val hDir = java.nio.file.Files.createTempDirectory("graft-h").toString
    Layout.zorderWrite(li, zDir, "l_partkey", "l_suppkey", nFiles = 8)
    Layout.hilbertWrite(li, hDir, "l_partkey", "l_suppkey", nFiles = 8)
    val zTotal = Layout.fileSpread(spark, zDir, "l_partkey") +
      Layout.fileSpread(spark, zDir, "l_suppkey")
    val hTotal = Layout.fileSpread(spark, hDir, "l_partkey") +
      Layout.fileSpread(spark, hDir, "l_suppkey")
    info(f"summed two-dim spread: morton $zTotal%.4f vs hilbert $hTotal%.4f")
    // no quadrant-seam jumps ⇒ contiguous ranges cover compacter
    // rectangles; allow a whisker of data-dependent slack
    assert(hTotal <= zTotal * 1.05,
      s"hilbert spread $hTotal worse than morton $zTotal")
    // and it must still be a genuine 2-D clustering
    assert(Layout.fileSpread(spark, hDir, "l_suppkey") < 0.6)
  }
}
