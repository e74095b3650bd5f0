package graft

import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.sources.{Fetch, Readers}

/** Fetch-to-lake against a loopback JDK HttpServer — the reference's
  * live-URL import surface (retry, error log, paged API) without any
  * network egress.
  */
class FetchSpec extends SparkSpecBase {

  private def withServer(test: (String, HttpServer) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.start()
      test(s"http://127.0.0.1:${server.getAddress.getPort}", server)
    } finally server.stop(0)
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) x.getResponseBody.write(bytes)
    x.close()
  }

  test("fetchToLake lands files, retries flaky sources, logs dead ones") {
    withServer { (base, server) =>
      val flakyHits = new AtomicInteger(0)
      server.createContext("/normal_tissue.tsv",
        (x: HttpExchange) => respond(x, 200, "gene\ttissue\nTP53\tliver\nBRCA1\tbreast\n"))
      server.createContext("/flaky.csv", (x: HttpExchange) =>
        if (flakyHits.incrementAndGet() < 3) respond(x, 503, "busy")
        else respond(x, 200, "gene,score\nKRAS,0.7\n"))
      server.createContext("/gone.csv", (x: HttpExchange) => respond(x, 404, "nope"))
      val lake = Files.createTempDirectory("graftlake").toString
      val results = Fetch.fetchToLake(Seq(
        "normal_tissue.tsv" -> s"$base/normal_tissue.tsv",
        "flaky.csv" -> s"$base/flaky.csv",
        "gone.csv" -> s"$base/gone.csv"), lake, maxRetries = 3, retryDelayMs = 1)
      val byName = results.map(r => r.name -> r).toMap
      assert(byName("normal_tissue.tsv").path.isDefined &&
        byName("normal_tissue.tsv").attempts == 1)
      assert(byName("flaky.csv").path.isDefined &&
        byName("flaky.csv").attempts == 3, s"flaky: ${byName("flaky.csv")}")
      assert(byName("gone.csv").path.isEmpty &&
        byName("gone.csv").error.exists(_.contains("404")))
      // the landed lake reads through the ordinary Spark sources
      val df = Readers.tsv(spark, byName("normal_tissue.tsv").path.get)
      assert(df.count() == 2 && df.columns.toSeq == Seq("gene", "tissue"))
      assert(Readers.csv(spark, byName("flaky.csv").path.get).count() == 1)
    }
  }

  test("fetchPaged follows next links until null and lands one file per page") {
    withServer { (base, server) =>
      server.createContext("/api/genes", (x: HttpExchange) => {
        val page = Option(x.getRequestURI.getQuery)
          .flatMap(_.split("&").find(_.startsWith("page=")))
          .map(_.stripPrefix("page=").toInt).getOrElse(1)
        val next =
          if (page < 3) s""""next": "$base/api/genes?page=${page + 1}",""" else """"next": null,"""
        respond(x, 200,
          s"""{$next "results": [{"gene": "G${page}A", "panel": $page}, {"gene": "G${page}B", "panel": $page}]}""")
      })
      val lake = Files.createTempDirectory("graftpaged").toString
      val results = Fetch.fetchPaged(s"$base/api/genes?page=1", lake, "panelapp")
      assert(results.length == 3 && results.forall(_.path.isDefined),
        s"expected 3 landed pages, got $results")
      // whole-document JSON pages read as a directory, one row per page
      val df = Readers.json(spark, lake, multiLine = true)
      assert(df.count() == 3)
      import org.apache.spark.sql.functions._
      val genes = df.select(explode(col("results.gene")).as("g"))
        .collect().map(_.getString(0)).toSet
      assert(genes == Set("G1A", "G1B", "G2A", "G2B", "G3A", "G3B"))
    }
  }
}
