package graft

import org.apache.spark.sql.functions._

import graft.operators.WebLinks

/** URL extraction + registrable-domain audit (q169/q170). The oracle
  * pins end-to-end hashes; these pin the NORMALIZATION CONTRACT on
  * hand-built URLs (scheme case, ports, query/fragment, multi-part
  * suffixes) and the plan shape (no join for the blocklist).
  */
class WebLinksSpec extends SparkSpecBase {
  import spark.implicits._

  private def linksOf(page: String): Seq[(String, String, String)] =
    WebLinks.extractLinks(
      Seq((1L, page)).toDF("doc_id", "page"), "doc_id", "page")
      .select("url", "host", "domain")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

  test("normalization: scheme case, query/fragment strip, host lowercase, port drop") {
    assert(linksOf("see HTTPS://WWW.Example.COM/Path?q=1#frag end") ===
      Seq(("www.example.com/Path", "www.example.com", "example.com")))
    // the URL matcher stops at ':' — a port URL contributes its host
    // only (the ':8080/a' tail stays behind as page text)
    assert(linksOf("x http://host.net:8080/a b") ===
      Seq(("host.net", "host.net", "host.net")))
    assert(linksOf("no links here at all") === Seq.empty)
  }

  test("registrable domain: multi-part suffixes take three labels, plain take two") {
    assert(linksOf("a http://deep.sub.site.co.uk/x b").head._3 === "site.co.uk")
    assert(linksOf("a http://deep.sub.site.org/x b").head._3 === "site.org")
    assert(linksOf("a http://co.uk/x b").head._3 === "co.uk") // bare suffix: no reg. label
    assert(linksOf("a http://localhost/x b").head._3 === "localhost")
  }

  test("domainAudit counts links, docs, hosts per domain; blocklist folds into the plan") {
    val docs = Seq(
      (1L, "http://a.site1.com/x http://b.site1.com/y http://c.org/z"),
      (2L, "http://a.site1.com/q")).toDF("doc_id", "page")
    val out = WebLinks.domainAudit(docs, "doc_id", "page", Seq("site1.com"))
      .orderBy("domain").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSeq ===
      Seq(("c.org", 1L, 1L, 1L, 0), ("site1.com", 3L, 2L, 2L, 1)))
    // scale shape: the blocklist is a literal, not a join
    val plan = WebLinks.domainAudit(docs, "doc_id", "page", Seq("site1.com"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"blocklist must not join:\n$plan")
  }

  test("docLinkProfile flags concentration and blocked links") {
    val docs = Seq(
      (1L, "http://a.com/1 http://a.com/2 http://a.com/3 http://b.net/1"),
      (2L, "plain text")).toDF("doc_id", "page")
    val out = WebLinks.docLinkProfile(docs, "doc_id", "page", Seq("a.com"))
      .collect()
    assert(out.length === 1) // doc 2 has no links → no row
    val r = out.head
    assert(r.getAs[Long]("n_links") === 4L)
    assert(r.getAs[Long]("n_domains") === 2L)
    assert(r.getAs[Long]("max_domain_links") === 3L)
    assert(r.getAs[Long]("blocked_links") === 3L)
  }

  test("canonicalization: scheme/www/fragment/utm variants collapse; params sort") {
    val docs = Seq(
      (1L, "HTTPS://www.Ex.com/p1?utm=x&b=2&a=1#frag"),
      (2L, "http://ex.com/p1?a=1&b=2"),
      (3L, "http://ex.com/p1/?b=2&a=1&utm_source=feed"),
      (4L, "http://ex.com/p2")).toDF("doc_id", "page")
    val out = WebLinks.canonicalizeUrls(docs, "doc_id", "page")
      .select("canonical").collect().map(_.getString(0))
    // docs 1-3 are variants of ONE resource; doc 4 is distinct
    assert(out.distinct.sorted === Array("ex.com/p1?a=1&b=2", "ex.com/p2"))
    // corpus-level invariants: no canonical keeps a variant artifact
    val canon = graft.queries.WebQueries.queries("q211_url_canonical")(spark, sf)
      .collect()
    assert(canon.nonEmpty)
    assert(canon.forall(r => !r.getAs[String]("canonical_host").startsWith("www.")))
    // the plant's utm=x / scheme-case variants guarantee collapses
    assert(canon.map(_.getAs[Long]("dup_extra")).sum > 0,
      "no URL variants collapsed — canonicalization inert")
  }
}
