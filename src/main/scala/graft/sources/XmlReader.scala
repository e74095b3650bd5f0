package graft.sources

import java.io.InputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** XML ingestion (SURVEY §2.2) — the remaining mainstream ingest
  * format next to CSV/TSV/JSON/parquet/ORC/xlsx/Avro/zip; public
  * genomics sources (NCBI eUtils, Ensembl, UniProt) all ship XML
  * exports of exactly this row-tag shape.
  *
  * JDK-only StAX pull parser (no external dependency, same policy as
  * [[XlsxReader]]): one DataFrame row per `rowTag` element —
  * attributes become `_name` columns (the spark-xml convention),
  * direct child elements become columns holding their full text
  * content, and a child repeated within one row concatenates its
  * values with "|" (the corpus's separate_rows idiom downstream).
  * Every column is StringType: schema-on-read, callers cast
  * explicitly (§2.2 #28).
  *
  * Scale shape: XML is not byte-splittable (an element boundary can't
  * be found mid-stream without parsing from the start), so like xlsx
  * this is a dimension-ingest format — parallelism is per FILE
  * (`binaryFiles` keeps each file one task; a 1000-file drop scales to
  * 1000 tasks), and fact-scale data belongs in parquet/Avro after one
  * ingest hop. DTDs and external entities are disabled (XXE).
  */
object XmlReader {

  /** Read `rowTag` elements from `path` (a file, directory, or glob).
    * `columns = None` sniffs the column set from the first
    * `sniffRows` rows of the first file on the driver — a bounded
    * metadata read, same cost class as csv inferSchema's first pass.
    */
  def xml(s: SparkSession, path: String, rowTag: String,
          columns: Option[Seq[String]] = None,
          sniffRows: Int = 100): DataFrame = {
    val cols = columns.getOrElse(sniffColumns(s, path, rowTag, sniffRows))
    require(cols.nonEmpty, s"no '$rowTag' rows found to infer columns from in $path")
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    val colsB = s.sparkContext.broadcast(cols)
    val rows = s.sparkContext.binaryFiles(path).flatMap { case (_, stream) =>
      val in = stream.open()
      val parsed =
        try parseRows(in, rowTag)
        finally in.close()
      parsed.map(m => Row.fromSeq(colsB.value.map(m.getOrElse(_, null))))
    }
    s.createDataFrame(rows, schema)
  }

  /** Union of column names over the first `sniffRows` rows of the
    * first file, in first-seen order (deterministic). */
  private def sniffColumns(s: SparkSession, path: String, rowTag: String,
                           sniffRows: Int): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    val first = {
      val matches = Option(fs.globStatus(hPath)).map(_.toSeq).getOrElse(Seq.empty)
      val files = matches.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }.map(_.getPath).sortBy(_.getName)
      files.headOption.getOrElse(
        throw new IllegalArgumentException(s"no files match $path"))
    }
    val in = fs.open(first)
    val rows = try parseRows(in, rowTag, maxRows = sniffRows) finally in.close()
    val seen = mutable.LinkedHashSet.empty[String]
    rows.foreach(_.foreachEntry((k, _) => seen += k))
    seen.toSeq
  }

  /** Parse one XML stream into per-row (column → value) maps.
    * Eager (returns a List): each file is a single bounded ingest
    * unit, and the stream must be consumed before it is closed.
    */
  private[sources] def parseRows(in: InputStream, rowTag: String,
                                 maxRows: Int = Int.MaxValue): List[mutable.LinkedHashMap[String, String]] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(in)
    val out = mutable.ListBuffer.empty[mutable.LinkedHashMap[String, String]]
    try {
      while (r.hasNext && out.size < maxRows) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == rowTag)
          out += parseRow(r)
      }
    } finally r.close()
    out.toList
  }

  /** Cursor is ON the row's START_ELEMENT; consumes through its
    * matching END_ELEMENT. Direct children collect their full nested
    * text content; deeper structure is flattened into that text.
    */
  /** Insertion-ordered so [[sniffColumns]]'s first-seen column order
    * is deterministic (an immutable Map would hash-scramble it). */
  private def parseRow(r: javax.xml.stream.XMLStreamReader): mutable.LinkedHashMap[String, String] = {
    val row = mutable.LinkedHashMap.empty[String, String]
    def put(k: String, v: String): Unit =
      row += k -> row.get(k).map(_ + "|" + v).getOrElse(v)
    (0 until r.getAttributeCount)
      .foreach(i => put("_" + r.getAttributeLocalName(i), r.getAttributeValue(i)))
    var depth = 1
    var child: String = null // name of the current direct child, if any
    val buf = new StringBuilder
    while (depth > 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (depth == 1) { child = r.getLocalName; buf.clear() }
          depth += 1
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
          if (depth == 1 && child != null) { put(child, buf.result()); child = null }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (depth >= 2) buf.append(r.getText)
        case _ => ()
      }
    }
    row
  }
}
