package graft.sources

import java.io.{DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}

/** WARC ingestion (SURVEY §2.2) — the ISO-28500 Web ARChive record
  * format every public crawl corpus ships in (Common Crawl, IA);
  * the natural upstream of the §2.3 web family (boilerplate q157,
  * links q169, domain caps q182, robots q179, URL canonicalization
  * q211). A record is a header block of `Name: value` lines
  * terminated by a blank line, then exactly `Content-Length` payload
  * bytes, then CRLF CRLF; records concatenate to form the file.
  *
  * JDK-only parser (the [[XmlReader]]/[[XlsxReader]] no-dependency
  * policy): one DataFrame row per record — the standard headers as
  * typed columns, the full header map preserved, and the payload as
  * an opaque BINARY column (the multimodal column discipline, §2.3
  * #40: bytes stay bytes until a downstream op decodes them).
  *
  * Scale shape: plain WARC is not byte-splittable (a record boundary
  * can't be found mid-stream without parsing from the start), so
  * parallelism is per FILE — exactly how the format is deployed:
  * crawls ship as many ~1 GB segment files and `binaryFiles` gives
  * one task per segment (production WARCs are per-record gzip
  * MEMBERS, which decompress as a stream the same way). Ingest is
  * one hop to parquet; fact-scale scans then read columnar.
  */
object WarcReader {

  val schema: StructType = StructType(Seq(
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  def warc(s: SparkSession, path: String): DataFrame = {
    val rows = s.sparkContext.binaryFiles(path).flatMap { case (_, stream) =>
      val in = stream.open()
      try parseRecords(in)
      finally in.close()
    }
    s.createDataFrame(rows, schema)
  }

  /** Parse one WARC stream into rows. Eager per file (each file is a
    * bounded segment by construction — see scale note above). */
  private[sources] def parseRecords(inRaw: InputStream): List[Row] = {
    val in = new DataInputStream(inRaw)
    val out = mutable.ListBuffer.empty[Row]
    var line = readLine(in)
    while (line != null) {
      // skip inter-record blank lines, find the version line
      while (line != null && line.isEmpty) line = readLine(in)
      if (line != null) {
        require(line.startsWith("WARC/"),
          s"malformed WARC: expected version line, got '$line'")
        val headers = mutable.LinkedHashMap.empty[String, String]
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val idx = h.indexOf(':')
          require(idx > 0, s"malformed WARC header line: '$h'")
          headers.put(h.substring(0, idx).trim.toLowerCase,
            h.substring(idx + 1).trim)
          h = readLine(in)
        }
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            "malformed WARC: record without Content-Length")).toLong
        require(len >= 0 && len <= Int.MaxValue, s"bad Content-Length $len")
        val payload = new Array[Byte](len.toInt)
        in.readFully(payload)
        out += Row(
          headers.getOrElse("warc-type", null),
          headers.getOrElse("warc-target-uri", null),
          headers.getOrElse("warc-date", null),
          headers.getOrElse("warc-record-id", null),
          headers.getOrElse("content-type", null),
          len,
          payload)
        line = readLine(in)
      }
    }
    out.toList
  }

  /** Read one CRLF- (or LF-) terminated ISO-8859-1 header line;
    * null at EOF. Header bytes are ASCII per spec; payload bytes are
    * read with readFully, never through here. */
  private def readLine(in: DataInputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var b = -1
    try b = in.read()
    catch { case _: EOFException => return null }
    if (b == -1) return null
    while (b != -1 && b != '\n') {
      if (b != '\r') buf.write(b)
      b = in.read()
    }
    new String(buf.toByteArray, StandardCharsets.ISO_8859_1)
  }

  /** Render records as WARC bytes — the inverse of [[parseRecords]],
    * kept in sync with it (fixture writer and export shim). */
  def render(records: Seq[(Map[String, String], Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (hdrs, payload) =>
      def w(s: String): Unit =
        out.write(s.getBytes(StandardCharsets.ISO_8859_1))
      w("WARC/1.0\r\n")
      hdrs.foreach { case (k, v) => w(s"$k: $v\r\n") }
      w(s"Content-Length: ${payload.length}\r\n")
      w("\r\n")
      out.write(payload)
      w("\r\n\r\n")
    }
    out.toByteArray
  }
}
