package graft

import org.apache.spark.sql.functions._

/** Round-17 invariants: the long-key (xxhash64) production path of
  * the exact-substring family is bit-equal to the md5 oracle path;
  * the incremental MEM index probe honors its coverage contract,
  * including the documented fragmentation mode; and the packed site
  * rank unpacks exactly beyond double precision.
  */
class Round17Spec extends SparkSpecBase {

  import spark.implicits._

  // the Round16Spec MEM corpus: cross-doc overlap, tandem
  // self-repeat, two disjoint shared passages, a 14-token decoy
  private def words(r: Range, p: String) = r.map(i => s"$p$i").mkString(" ")
  private lazy val memCorpus = {
    val shared = words(1 to 17, "s")
    val block = words(1 to 15, "b")
    val decoy = words(1 to 14, "d")
    Seq(
      (1L, s"${words(1 to 5, "a")} $shared ${words(1 to 4, "z")}"),
      (2L, s"$shared ${words(1 to 6, "q")} $decoy"),
      (3L, s"$block ${words(1 to 3, "m")} $block"),
      (4L, s"${words(1 to 7, "k")} $block $decoy"),
      (5L, words(1 to 40, "u"))
    ).toDF("doc_id", "text")
  }

  test("maximalExactMatches: long-key path is bit-equal to the md5 path") {
    def run(lk: Boolean) = operators.Dedup
      .maximalExactMatches(memCorpus, "doc_id", "text", minLen = 15,
        maxOccurrences = 64, longKeys = lk)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val md5Set = run(false)
    val longSet = run(true)
    assert(md5Set.nonEmpty, "corpus must plant MEMs for the parity to mean anything")
    assert(longSet == md5Set,
      s"long-key MEMs diverge from md5: ${longSet.diff(md5Set)} / ${md5Set.diff(longSet)}")
  }

  test("exactSubstrSpans: long-key path is bit-equal to the md5 path") {
    def run(lk: Boolean) = operators.Dedup
      .exactSubstrSpans(memCorpus, "doc_id", "text", minLen = 15, longKeys = lk)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val md5Set = run(false)
    assert(md5Set.nonEmpty)
    assert(run(true) == md5Set)
  }

  test("memProbe reports the lake's first site with exact extents") {
    // lake: docs 1-2 both hold the 17-token passage (doc 1 first);
    // batch doc 10 holds it once — ONE run, attributed to doc 1
    val shared = words(1 to 17, "s")
    val lake = Seq(
      (1L, s"${words(1 to 5, "a")} $shared ${words(1 to 4, "z")}"), // P at pos 6
      (2L, s"$shared ${words(1 to 6, "q")}")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"${words(1 to 3, "w")} $shared ${words(1 to 12, "v")}")) // P at pos 4
      .toDF("doc_id", "text")
    val idx = operators.Dedup.memIndexMinSites(lake, "doc_id", "text", 15)
    val out = operators.Dedup.memProbe(idx, batch, "doc_id", "text", 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // the 17-token run yields 3 consecutive matched 15-gram starts at
    // pos 4..6 — merged extent start=4, len 17, first site doc 1 pos 6
    assert(out == Set((10L, 4L, 1L, 6L, 17L)), s"got $out")
  }

  test("memProbe fragmentation is coverage-preserving (documented contract)") {
    // doc 20 carries a 30-token run shared with lake doc 3; the run's
    // FIRST 15-gram also occurs (earlier) in lake doc 1, so the
    // probe's diagonal breaks at the disagreeing first site. The
    // contract: extents may fragment, but every position of the
    // shared run stays covered by some reported match, and every
    // reported match is ≥ minLen.
    val run30 = words(1 to 30, "r")
    val prefix15 = words(1 to 15, "r")
    val lake = Seq(
      (1L, s"$prefix15 ${words(1 to 5, "x")}"), // holds ONLY the prefix gram
      (3L, s"${words(1 to 4, "y")} $run30")     // holds the full run at pos 5
    ).toDF("doc_id", "text")
    val batch = Seq((20L, s"${words(1 to 2, "w")} $run30")).toDF("doc_id", "text")
    val idx = operators.Dedup.memIndexMinSites(lake, "doc_id", "text", 15)
    val out = operators.Dedup.memProbe(idx, batch, "doc_id", "text", 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.forall(_._5 >= 15), s"sub-minLen extent: ${out.mkString(",")}")
    // coverage: batch positions 3..32 (the 30-token run) all inside
    // some reported [start, start+len)
    val covered = out.flatMap(m => m._2 until (m._2 + m._5)).toSet
    assert((3L to 32L).forall(covered), s"coverage hole: $covered")
    // and the fragmentation really happened: the prefix gram (start 3)
    // attributes to doc 1, the rest of the run to doc 3
    assert(out.exists(m => m._2 == 3L && m._3 == 1L), s"got ${out.mkString(",")}")
    assert(out.exists(m => m._3 == 3L && m._5 >= 15L), s"got ${out.mkString(",")}")
  }

  test("packed site rank unpacks exactly beyond double precision") {
    // doc_id 10^7 → rank ~10^16 > 2^53: IEEE division would round;
    // the probe's `div` must not
    val sharedTxt = words(1 to 20, "s")
    val lake = Seq((10000000L, sharedTxt)).toDF("doc_id", "text")
    val batch = Seq((99L, sharedTxt)).toDF("doc_id", "text")
    val idx = operators.Dedup.memIndexMinSites(lake, "doc_id", "text", 15)
    val out = operators.Dedup.memProbe(idx, batch, "doc_id", "text", 15)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 10000000L, s"lake_doc mangled: ${out.head}")
    assert(out.head.getLong(3) == 1L)
    assert(out.head.getLong(4) == 20L)
  }
}
