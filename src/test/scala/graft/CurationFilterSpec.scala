package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Round-9 curation-filter invariants: C4 line rules, paragraph-level
  * dedup keeper semantics, and the JS-divergence drift bounds — each
  * on planted inputs with hand-computable answers.
  */
class CurationFilterSpec extends SparkSpecBase {
  import spark.implicits._

  test("c4Filter applies the line rules exactly") {
    val page =
      "one two three four five six." + "\n" + // kept
        "too short." + "\n" + // < 5 words
        "no terminal punct here at all" + "\n" + // no . ! ?
        "please enable javascript to continue." + "\n" + // blocklist
        "a b c d { e } f." + "\n" + // brace line
        "six more words make this fine!" // kept (bang)
    val docs = Seq((1L, page), (2L, ""), (3L, "clean line with five words.")).toDF("doc_id", "text")
    val out = TextAnalysis.c4Filter(docs, "doc_id", "text")
      .orderBy("doc_id").collect()

    val d1 = out(0)
    assert(d1.getAs[Long]("n_lines") == 6L)
    assert(d1.getAs[Long]("n_kept") == 2L)
    assert(d1.getAs[Boolean]("has_brace"))
    assert(!d1.getAs[Boolean]("keep"), "brace page must be dropped whole")

    val d2 = out(1) // empty text → zero lines, keep = false
    assert(d2.getAs[Long]("n_lines") == 0L && !d2.getAs[Boolean]("keep"))

    val d3 = out(2) // 1 kept line < minKeptLines=3 → dropped, no brace
    assert(d3.getAs[Long]("n_kept") == 1L && !d3.getAs[Boolean]("keep")
      && !d3.getAs[Boolean]("has_brace"))
  }

  test("c4Filter keep requires minKeptLines clean lines") {
    val kept3 = Seq.fill(3)("these five words end properly.").mkString("\n")
    val docs = Seq((1L, kept3)).toDF("doc_id", "text")
    val out = TextAnalysis.c4Filter(docs, "doc_id", "text").collect().head
    assert(out.getAs[Long]("n_kept") == 3L && out.getAs[Boolean]("keep"))
  }

  test("paragraphDedup keeps only the globally first occurrence and reassembles in order") {
    // p1 appears in doc1@0 (keeper) and doc1@2 + doc2@0 (dropped);
    // p2 unique to doc1; p3 unique to doc2.
    val docs = Seq(
      (1L, "alpha beta\n\nunique one\n\nalpha beta"),
      (2L, "alpha beta\n\nunique two")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()

    val d1 = out(0)
    assert(d1.getAs[Long]("n_paras") == 3L && d1.getAs[Long]("n_kept") == 2L)
    val d2 = out(1)
    assert(d2.getAs[Long]("n_paras") == 2L && d2.getAs[Long]("n_kept") == 1L)

    // reassembly: doc1 keeps paras 0,1 in order; doc2 keeps only "unique two"
    val h1 = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta\n\nunique one".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d1.getAs[String]("new_hash") == h1)
    val h2 = java.security.MessageDigest.getInstance("MD5")
      .digest("unique two".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(d2.getAs[String]("new_hash") == h2)
  }

  test("paragraphDedup: a full-copy doc loses every paragraph (null reassembly)") {
    val docs = Seq(
      (1L, "alpha beta\n\ngamma delta"),
      (5L, "alpha beta\n\ngamma delta")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_kept") == 2L)
    val copy = out(1)
    assert(copy.getAs[Long]("n_kept") == 0L)
    assert(copy.isNullAt(copy.fieldIndex("new_hash")))
  }

  test("jsDivergence: identical sources score 0, a disjoint-vocab source scores ln 2") {
    val docs = Seq(
      ("a", "red green blue red green blue"),
      ("b", "red green blue red green blue"),
      ("c", "xx yy zz xx yy zz")).toDF("source", "text")
    val out = TextAnalysis.jsDivergenceBySource(docs, "source", "text")
      .orderBy("source").collect()
    // a vs rest: rest = b(identical dist) + c(disjoint); partial overlap
    val jsA = out(0).getAs[Double]("js_divergence")
    assert(jsA > 0.0 && jsA < math.log(2.0))
    // c's distribution is fully disjoint from a+b → JS = ln 2 exactly
    val jsC = out(2).getAs[Double]("js_divergence")
    assert(math.abs(jsC - math.log(2.0)) < 1e-5,
      s"disjoint source must score ln2, got $jsC")
    out.foreach { r =>
      val js = r.getAs[Double]("js_divergence")
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9)
    }
  }

  test("featureHash: integer norm identities hold on the real corpus") {
    val out = TextAnalysis.featureHash(
      Tables.documents(spark, sf), "doc_id", "text", dims = 64).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nb = r.getAs[Long]("n_buckets"); val nt = r.getAs[Long]("n_tokens")
      val nnz = r.getAs[Long]("nnz"); val l1 = r.getAs[Long]("l1")
      val l2sq = r.getAs[Long]("l2sq")
      assert(nb <= 64 && nb <= nt, "at most dims occupied buckets")
      assert(nnz <= nb, "cancelled buckets can only shrink nnz")
      assert(l1 <= nt, "|Σ±1| per bucket is bounded by its token count")
      assert(l2sq >= l1, "s² ≥ |s| for integer s")
      assert(l2sq <= l1 * l1, "Cauchy-Schwarz on the signed counts")
    }
  }

  test("featureHash: same token always lands in the same signed bucket (doc permutation invariant)") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(a, "doc_id", "text", dims = 64)
      .select("n_buckets", "n_tokens", "nnz", "l2sq", "l1")
      .distinct().collect()
    assert(out.length == 1, "token order must not change the vector")
  }

  test("langAudit: confusion matrix exact on planted multilingual docs") {
    import spark.implicits._
    val docs = Seq(
      ("en", "the cat and the dog of a house to go"),   // truly en
      ("en", "el perro de la casa que los gatos"),      // mislabeled es
      ("es", "el gato de la mesa que los perros"),      // truly es
      ("fr", "le chat est une merveille des les rues"), // truly fr
      ("fr", "the quick fox and the lazy dog of old"))  // mislabeled en
      .toDF("lang", "text")
    val out = graft.operators.TextAnalysis.langAudit(docs, "text", "lang")
      .orderBy("lang", "pred_lang").collect()
    val asMap = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n"), r.getAs[Long]("lang_total"),
        r.getAs[Double]("rate"))).toMap
    assert(asMap(("en", "en")) == (1L, 2L, 0.5))
    assert(asMap(("en", "es")) == (1L, 2L, 0.5))
    assert(asMap(("es", "es")) == (1L, 1L, 1.0))
    assert(asMap(("fr", "fr")) == (1L, 2L, 0.5))
    assert(asMap(("fr", "en")) == (1L, 2L, 0.5))
    assert(out.length == 5)
  }

  test("jsDivergence on the real corpus: every source within [0, ln2], near-uniform corpus scores low") {
    val out = TextAnalysis.jsDivergenceBySource(
      Tables.documents(spark, sf), "source", "text").collect()
    assert(out.length == 20)
    out.foreach { r =>
      val js = r.getAs[Double]("js_divergence")
      assert(js >= 0.0 && js <= math.log(2.0))
      // sources share one synthetic vocabulary — drift must be tiny
      assert(js < 0.05, s"${r.getAs[String]("source")} drifted: $js")
    }
  }

  test("q176: epoch schedule conserves the budget and caps repeats") {
    val rows = SparkEntry.queries("q176_epoch_schedule")(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalChars = rows.map(_.getAs[Long]("src_chars")).sum.toDouble
    // allocations sum back to the 2x budget (before capping)
    val allocSum = rows.map(_.getAs[Double]("alloc_chars")).sum
    assert(math.abs(allocSum - 2.0 * totalChars) / (2.0 * totalChars) < 1e-6)
    rows.foreach { r =>
      val raw = r.getAs[Double]("epochs_raw")
      val capped = r.getAs[Double]("epochs")
      assert(capped <= 4.0 + 1e-9)
      assert(capped <= raw + 1e-9)
      val verdict = r.getAs[String]("verdict")
      if (raw > 4.0) assert(verdict === "repeat_capped")
      else if (raw > 1.0) assert(verdict === "repeat")
      else assert(verdict === "fresh")
    }
    // a sqrt-temperature mixture over an oversubscribed budget must
    // upsample the SMALLEST sources hardest
    val bySize = rows.sortBy(_.getAs[Long]("src_chars"))
    assert(bySize.head.getAs[Double]("epochs_raw") >=
      bySize.last.getAs[Double]("epochs_raw"))
  }
}
