package graft

import org.apache.spark.sql.functions._

/** Round-17 OPTIMIZATION invariants: every rewrite in the optimization
  * round must be provably result-preserving. Each test pins a rewritten
  * operator against the spelling it replaced, bit-exactly.
  */
class Round17OptSpec extends SparkSpecBase {

  // sf inherited from SparkSpecBase (/root/testdata/sf0.001)

  test("IVF narrow-kernel assignment ≡ window-path assignment, bit-exact") {
    // The round-17 rewrite of Similarity.ivfAssignScored replaced the
    // corpus×nCentroids crossJoin + Window.partitionBy(vec_id) argmax
    // with a narrow broadcast-array kernel (NearestCentroidCosine).
    // The window spelling is still live as the distributedCentroids
    // path — so assert (cid, sim) parity per vec_id across BOTH paths
    // on real embeddings through a real Lloyd-trained quantizer.
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val cents = operators.Similarity.ivfTrain(emb, nCentroids = 16)
    def collect(distributed: Boolean) =
      operators.Similarity.ivfAssignScored(cents, emb, distributed)
        .select(col("vec_id"), col("cid"), col("sim"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
        .toMap
    val narrow = collect(distributed = false)
    val window = collect(distributed = true)
    assert(narrow.nonEmpty, "assignment must produce rows")
    assert(narrow.size == window.size,
      s"row counts diverge: narrow=${narrow.size} window=${window.size}")
    narrow.foreach { case (id, (cid, sim)) =>
      val (wCid, wSim) = window(id)
      assert(cid == wCid && sim == wSim,
        s"vec $id: narrow=($cid,$sim) window=($wCid,$wSim)")
    }
  }

  test("normWords kernel ≡ regex spelling, bit-exact (incl. unicode edges)") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val alphabet =
      "abcXYZ019 .,!-_éÉ中文K😀\t\n'\"@#" // Kelvin sign, emoji, CJK
    val fuzz = (1 to 300).map(_ =>
      (1 to rng.nextInt(80)).map(_ => alphabet(rng.nextInt(alphabet.length)))
        .mkString)
    val edge = Seq("", " ", "  ", "a.b", "A B", "a  b ", ".,!", "KK9",
      "é é", "abKcd", "ﬁligature", "İstanbul")
    val docs = (fuzz ++ edge).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val both = docs.select(col("id"),
        graft.functions.GraftFunctions.normWords(col("text")).as("kernel"),
        graft.functions.GraftFunctions.normWordsRegex(col("text")).as("regex"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"id=${r.getLong(0)}: kernel=${r.getSeq[String](1)} regex=${r.getSeq[String](2)}")
    }
    // real corpus too: every document at sf0.001 tokenizes identically
    val corpus = Tables.documents(spark, sf).select(
        graft.functions.GraftFunctions.normWords(col("text")).as("kernel"),
        graft.functions.GraftFunctions.normWordsRegex(col("text")).as("regex"))
      .collect()
    assert(corpus.nonEmpty)
    corpus.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("md5HexLong kernel ≡ conv(substring(md5(x),s,l),16,10)::long") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val strs = (1 to 500).map(_ =>
      rng.alphanumeric.take(rng.nextInt(30)).mkString) ++
      Seq("", " ", "é中😀", "dp:123", "q109:abc")
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    Seq((1, 15), (1, 8), (9, 1), (1, 1), (1, 6), (17, 15)).foreach {
      case (st, ln) =>
        val bad = df.select(
            graft.functions.GraftFunctions.md5HexLong(col("s"), st, ln).as("k"),
            conv(substring(md5(col("s")), st, ln), 16, 10).cast("long").as("c"))
          .filter(col("k") =!= col("c")).count()
        assert(bad == 0, s"md5HexLong($st,$ln) diverges on $bad rows")
    }
  }

  test("IVF narrow kernel honors the (sim desc, cid asc) tie-break") {
    import spark.implicits._
    // two identical centroids (cid 3 and 1) — the winner must be cid 1,
    // exactly what row_number over (sim desc, cid asc) would pick
    val cents = Seq(
      (3, Array(1.0f, 0.0f)), (1, Array(1.0f, 0.0f)), (2, Array(0.0f, 1.0f)))
      .toDF("cid", "cemb")
    val vecs = Seq((10L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = operators.Similarity.ivfAssignScored(cents, vecs)
      .select(col("vec_id"), col("cid"), col("sim")).collect()
    assert(out.length == 1)
    assert(out(0).getInt(1) == 1, s"tie must break to the smallest cid, got ${out(0)}")
    assert(out(0).getDouble(2) == 1.0)
  }
}
