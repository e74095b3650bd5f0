package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.Duration

import scala.collection.mutable
import scala.util.control.NonFatal

/** SURVEY.md §2.2 — the reference import layer's LIVE-fetch surface,
  * re-expressed as fetch-to-lake: every source file is pulled from a
  * URL with bounded retries and a per-source error log
  * (reference temp-import-all-api-ftp.R:29-228 wraps each download in
  * tryCatch + retry), landed in a lake directory, and only then read
  * by the Spark sources — the cluster never fetches.
  *
  * Driver-side by design: the reference's feeds are dimension-scale
  * (single files, paged JSON APIs), and landing them once into the
  * lake is the shape that scales — executors read the landed parquet/
  * csv/json, fetch happens exactly once regardless of cluster size.
  * Bulk distributed ingest belongs to the file-based readers.
  *
  * JDK-only: java.net.http.HttpClient, no third-party dependency.
  */
object Fetch {

  /** One fetch outcome: where the file landed (None = failed after
    * all retries), how many attempts it took, and the last error.
    */
  case class FetchResult(name: String, path: Option[String],
                         attempts: Int, error: Option[String])

  private def client(timeoutMs: Long): HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(timeoutMs))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

  private def get(c: HttpClient, url: String, timeoutMs: Long): Array[Byte] = {
    val resp = c.send(
      HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs)).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $url")
    resp.body()
  }

  /** Fetch each (name, url) into `lakeDir/name` with up to
    * `maxRetries` attempts per source (the reference's retry loop,
    * import-api-ftp.R:29-40). A failing source is logged, never
    * aborts the batch (the [[Ingest]] contract); an existing landed
    * file is only replaced after a SUCCESSFUL fetch (write to temp,
    * atomic move), so a flaky re-run can't truncate the lake.
    */
  def fetchToLake(sources: Seq[(String, String)], lakeDir: String,
                  maxRetries: Int = 3, retryDelayMs: Long = 100,
                  timeoutMs: Long = 10000): Seq[FetchResult] = {
    Files.createDirectories(Paths.get(lakeDir))
    val c = client(timeoutMs)
    sources.map { case (name, url) =>
      var attempt = 0
      var lastErr: Option[String] = None
      var landed: Option[String] = None
      while (landed.isEmpty && attempt < maxRetries) {
        attempt += 1
        try {
          val bytes = get(c, url, timeoutMs)
          val target = Paths.get(lakeDir, name)
          val tmp = Files.createTempFile(Paths.get(lakeDir), s".$name.", ".part")
          Files.write(tmp, bytes)
          Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
          landed = Some(target.toString)
        } catch {
          case NonFatal(e) =>
            lastErr = Some(String.valueOf(e.getMessage))
            if (attempt < maxRetries && retryDelayMs > 0) Thread.sleep(retryDelayMs)
        }
      }
      FetchResult(name, landed, attempt, if (landed.isEmpty) lastErr else None)
    }
  }

  private val nextRe = """"next"\s*:\s*"([^"]+)"""".r

  /** Paged REST API → one JSON file per page in `lakeDir` (the
    * PanelApp loop, import-api-ftp.R:214-221: follow the `next` link
    * until null). Each landed page is a whole-document JSON readable
    * via [[Readers.json]] with multiLine=true on the directory; the
    * next-page URL is taken from the page's `"next": "..."` field
    * (absent or null ⇒ done), overridable for APIs that page
    * differently. `maxPages` bounds runaway pagination.
    */
  def fetchPaged(firstUrl: String, lakeDir: String, name: String,
                 maxPages: Int = 1000, timeoutMs: Long = 10000,
                 nextUrl: String => Option[String] = defaultNextUrl): Seq[FetchResult] = {
    Files.createDirectories(Paths.get(lakeDir))
    val c = client(timeoutMs)
    val out = mutable.Buffer.empty[FetchResult]
    var url: Option[String] = Some(firstUrl)
    var page = 0
    while (url.isDefined && page < maxPages) {
      page += 1
      val pageName = f"${name}_page$page%05d.json"
      try {
        val bytes = get(c, url.get, timeoutMs)
        val target = Paths.get(lakeDir, pageName)
        Files.write(target, bytes)
        out += FetchResult(pageName, Some(target.toString), 1, None)
        url = nextUrl(new String(bytes, "UTF-8"))
      } catch {
        case NonFatal(e) =>
          out += FetchResult(pageName, None, 1, Some(String.valueOf(e.getMessage)))
          url = None // a failed page breaks the chain — partial lake, error logged
      }
    }
    out.toSeq
  }

  /** `"next": "<url>"` extraction — JSON `null` or a missing field
    * ends pagination (the PanelApp response shape).
    */
  def defaultNextUrl(body: String): Option[String] =
    nextRe.findFirstMatchIn(body).map(_.group(1))
}
