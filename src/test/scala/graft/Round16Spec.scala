package graft

import org.apache.spark.sql.functions._

/** Round-16 invariants: the linkPrediction hot-hub fanout guard
  * (planted 1,000-degree hub completes with bounded, exactly
  * predictable output; small-degree graphs are cap-invariant), and
  * the DECIMAL(38) overflow headroom of the midrank/tie machinery.
  */
class Round16Spec extends SparkSpecBase {

  import spark.implicits._

  test("linkPrediction: a planted 1,000-degree hub is fanout-bounded") {
    // pure star 0—{1..1000}: ungarded wedge fan-out is deg² = 10⁶
    // pairs; with maxFanout=64 the hub contributes wedges only from
    // its 64 lowest-id leaves → exactly C(64,2) = 2016 candidate
    // pairs, every one with common_neighbors = 1 and the AA weight
    // still computed from the TRUE hub degree 1000.
    val e = (1L to 1000L).map(i => (0L, i)).toDF("a", "b")
    val out = operators.Graph.linkPrediction(e, maxFanout = 64).collect()
    assert(out.length == 64 * 63 / 2, s"expected C(64,2), got ${out.length}")
    val leaves = out.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(leaves == (1L to 64L).toSet, "cap must keep the LOWEST-id leaves")
    val aaExpect = BigDecimal(1.0 / math.log(1000.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { r =>
      assert(r.getLong(2) == 1L) // the hub is the only shared neighbor
      assert(r.getDouble(3) == 1.0) // jaccard 1/(1+1-1): true degrees
      assert(math.abs(r.getDouble(4) - aaExpect) < 1e-9,
        s"AA must use the TRUE hub degree: ${r.getDouble(4)} vs $aaExpect")
    }
  }

  test("midrank tie term survives bins where Long arithmetic wraps") {
    // the q260/q318 tie correction Σ(m³ − m): a single 3M-row value
    // bin gives m³ = 2.7·10¹⁹ > Long.MaxValue (9.2·10¹⁸) — the
    // round-16 DECIMAL(38,0) promotion keeps it exact where the old
    // Long form wrapped silently. New overflow bound: 10³⁸ (a ~10¹²-
    // row bin), with decimal overflow NULLing — never silent wrap.
    import org.apache.spark.sql.types.DecimalType
    val m = 3000000L
    val df = Seq(m).toDF("m")
    val dec = df.agg(sum(col("m").cast(DecimalType(38, 0)) * col("m")
      * col("m") - col("m"))).collect()(0).getDecimal(0)
    val expect = BigInt(m) * BigInt(m) * BigInt(m) - BigInt(m)
    assert(BigInt(dec.toBigInteger) == expect, s"$dec vs $expect")
    assert(BigInt(m * m * m) != BigInt(m) * m * m,
      "sanity: the old Long form really wraps here")
  }

  test("maximalExactMatches equals brute-force MEM enumeration") {
    // planted corpus: cross-doc overlap, a tandem self-repeat, two
    // disjoint shared passages, and a sub-threshold (14-token) decoy
    def words(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    val shared = words(1 to 17, "s") // 17 tokens shared by d1/d2
    val block = words(1 to 15, "b")  // 15 tokens, twice in d3 + once in d4
    val decoy = words(1 to 14, "d")  // below minLen: must never surface
    val docs = Map(
      1L -> s"${words(1 to 5, "a")} $shared ${words(1 to 4, "z")}",
      2L -> s"$shared ${words(1 to 6, "y")}",
      3L -> s"$block $block",
      4L -> s"${words(1 to 3, "w")} $block $decoy",
      5L -> s"$decoy ${words(1 to 9, "v")}")
    val df = docs.toSeq.toDF("doc_id", "text")
    val got = operators.Dedup
      .maximalExactMatches(df, "doc_id", "text", minLen = 15)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    // brute force: maximal diagonal token runs >= L over all ordered
    // site pairs — the definition a generalized suffix array realizes
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty)
    }
    val L = 15
    val expect = scala.collection.mutable.Set[(Long, Long, Long, Long, Long)]()
    val ids = toks.keys.toSeq.sorted
    for (i <- ids; j <- ids if i <= j) {
      val a = toks(i); val b = toks(j)
      for (delta <- -a.length to b.length
           if !(i == j && delta <= 0)) {
        var p = 1
        while (p <= a.length) {
          val q = p + delta
          if (q >= 1 && q <= b.length && a(p - 1) == b(q - 1)) {
            var e = p
            while (e < a.length && e + delta < b.length &&
              a(e) == b(e + delta)) e += 1
            val len = e - p + 1
            if (len >= L)
              expect += ((i, p.toLong, j, q.toLong, len.toLong))
            p = e + 1
          } else p += 1
        }
      }
    }
    assert(got == expect.toSet,
      s"missing=${expect.toSet -- got} extra=${got -- expect}")
    // shape sanity: the 17-token cross-doc MEM and the tandem repeat
    assert(got.contains((1L, 6L, 2L, 1L, 17L)))
    assert(got.contains((3L, 1L, 3L, 16L, 15L)))
  }

  test("applyMemDedup keeps exactly the globally-first occurrence") {
    def words(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
    val passage = words(1 to 20, "p") // shared d1 → d2
    val block = words(1 to 15, "b")   // tandem inside d3
    val docs = Seq(
      (1L, s"${words(1 to 3, "a")} $passage ${words(1 to 2, "z")}"),
      (2L, s"${words(1 to 4, "y")} $passage ${words(1 to 3, "x")}"),
      (3L, s"$block $block ${words(1 to 2, "w")}"),
      (4L, words(1 to 30, "u"))).toDF("doc_id", "text")
    val out = operators.Dedup.applyMemDedup(docs, "doc_id", "text", 15)
      .orderBy("doc_id").collect()
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectClean = Seq(
      s"${words(1 to 3, "a")} $passage ${words(1 to 2, "z")}", // first site intact
      s"${words(1 to 4, "y")} ${words(1 to 3, "x")}",          // later copy cut
      s"$block ${words(1 to 2, "w")}",                         // tandem 2nd cut
      words(1 to 30, "u"))                                     // untouched
    out.zip(expectClean).foreach { case (r, exp) =>
      assert(r.getString(5) == md5(exp),
        s"doc ${r.getLong(0)}: clean digest mismatch (len ${r.getLong(4)}" +
          s" vs expected ${exp.length})")
      assert(r.getLong(4) == exp.length.toLong)
    }
    // counts: d2 cut 20 of 27, d3 cut 15 of 32, d1/d4 cut 0
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((25L, 0L, 0L), (27L, 20L, 1L), (32L, 15L, 1L), (30L, 0L, 0L)))
  }

  test("maximalExactMatches drops grams hotter than the occurrence cap") {
    // one 15-token block planted in 6 docs: every gram occurs 6 times;
    // cap 4 drops them all, cap 8 keeps all C(6,2)=15 site pairs
    val block = (1 to 15).map(i => s"t$i").mkString(" ")
    val df = (1L to 6L).map(id => (id, s"pre$id $block post$id"))
      .toDF("doc_id", "text")
    val capped = operators.Dedup
      .maximalExactMatches(df, "doc_id", "text", 15, maxOccurrences = 4)
    assert(capped.count() == 0L)
    val open = operators.Dedup
      .maximalExactMatches(df, "doc_id", "text", 15, maxOccurrences = 8)
    assert(open.count() == 15L)
  }

  test("linkPrediction: graphs under the cap are cap-invariant") {
    // max degree 3 < maxFanout 4: the guarded result must equal the
    // effectively-unguarded one (cap larger than any degree)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
      .toDF("a", "b")
    def rows(cap: Int) =
      operators.Graph.linkPrediction(e, maxFanout = cap)
        .orderBy("u", "w").collect().toSeq.map(_.toSeq)
    assert(rows(4) == rows(1000))
  }
}
