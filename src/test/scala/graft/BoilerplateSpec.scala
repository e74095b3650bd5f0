package graft

import org.apache.spark.sql.functions._

import graft.operators.Boilerplate

/** Round-9 HTML boilerplate extraction: block segmentation, link-
  * density verdicts, and exact main-text recovery from planted
  * template chrome.
  */
class BoilerplateSpec extends SparkSpecBase {
  import spark.implicits._

  test("planted template chrome strips; body paragraphs survive verbatim") {
    val body1 = "the quick brown fox jumps over the lazy dog every day"
    val body2 = "a second paragraph with enough words to pass the floor"
    val html =
      """<html><head><title>My Page</title></head><body>""" +
        """<header><nav><a href="/">Home</a> <a href="/x">Products</a> <a href="/y">Support</a></nav></header>""" +
        s"""<div id="main"><p>$body1</p><p>$body2</p></div>""" +
        """<ul><li><a href="/a">Related link one here</a></li><li><a href="/b">Related link two here</a></li></ul>""" +
        """<footer><p><a href="/t">Terms of Service</a> <a href="/p">Privacy Policy</a> <a href="/c">Cookie Settings</a> (c) 2021</p></footer>""" +
        """</body></html>"""
    val out = Boilerplate.extractMain(
        Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, Long, Long, String)].head()
    assert(out._3 == 2L, s"exactly the two body paragraphs are content: $out")
    assert(out._4 == s"$body1 $body2", s"main text must be verbatim: ${out._4}")
  }

  test("per-block verdicts: link density and word floor behave as specified") {
    val html =
      """<div><p>plain words one two three four five</p>""" +
        """<p>tiny text</p>""" +
        """<p><a href="/l">all of this text is anchor text in one link</a></p>""" +
        """<p>some words around <a href="/s">a</a> short link here ok</p></div>"""
    val b = Boilerplate.blocks(Seq((1L, html)).toDF("doc_id", "html"),
        "doc_id", "html")
      .select("text", "n_words", "link_density", "verdict")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSeq
    val byText = b.map(x => x._1 -> x).toMap
    assert(byText("plain words one two three four five")._4 == "content")
    assert(byText("tiny text")._4 == "boilerplate")       // under the word floor
    val allLink = byText("all of this text is anchor text in one link")
    assert(allLink._3 == 1.0 && allLink._4 == "boilerplate")
    val mostlyText = byText("some words around a short link here ok")
    assert(mostlyText._3 < 0.33 && mostlyText._4 == "content")
  }

  test("q157 recovers the corpus text exactly for every long-enough doc") {
    val out = SparkEntry.queries("q157_html_extract")(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val joined = out.join(docs, "doc_id")
      .select(col("doc_id"), col("main_text"), col("text"),
        size(filter(split(col("text"), " "), w => w =!= "")).as("nw"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (main, text, nw) = (r.getString(1), r.getString(2), r.getInt(3))
      if (nw >= 5)
        assert(main == text.trim.replaceAll(" +", " "),
          s"doc ${r.getLong(0)}: body must survive extraction verbatim")
      else assert(main == "", s"doc ${r.getLong(0)}: short body must drop")
    }
    // chrome never leaks: 3 blocks per page (title, nav, footer) are
    // boilerplate, so content blocks are 0 or 1
    assert(out.filter(col("n_content_blocks") > 1).count() == 0)
  }
}
