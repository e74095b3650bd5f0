package graft.sources

import java.io.{ByteArrayInputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal .xlsx ingestion — the last import-surface gap vs the
  * reference, which loads four manuscript supplements via
  * `openxlsx::read.xlsx` (reference/scripts/import/
  * temp-import-all-manuscript-files.R:9-14). An xlsx file is a zip of
  * XML parts; this reader uses only JDK APIs (java.util.zip + StAX):
  * no third-party dependency.
  *
  * Scale note: manuscript supplement tables are small (thousands of
  * rows) — the file is parsed ON THE DRIVER and parallelized into a
  * DataFrame, the same pattern as any driver-side dimension load. For
  * bulk columnar data the parquet/ORC readers are the 100 TB path;
  * xlsx is a dimension-ingest format by nature (single zip stream,
  * not splittable).
  */
object XlsxReader {

  /** Read sheet N (1-based) of an .xlsx into a DataFrame. First row
    * at or after `startRow` (1-based, `openxlsx::read.xlsx(startRow=)`
    * semantics — reference temp-import-all-manuscript-files.R:13) =
    * header (column names). Column types are inferred per column:
    * LONG if every non-null cell is an integral number, DOUBLE if
    * numeric, BOOLEAN if every cell is an xlsx boolean, else STRING.
    */
  def read(spark: SparkSession, path: String, sheet: Int = 1,
           startRow: Int = 1): DataFrame = {
    val (schema, data) = parseTyped(path, sheet.toString, startRow)
    spark.createDataFrame(data.map(Row.fromSeq).asJava, schema)
  }

  /** Read a sheet by NAME — `openxlsx::read.xlsx(sheet = 'Supplementary
    * Table 2')` (reference temp-import-all-manuscript-files.R:26-27).
    * The name is resolved through `xl/workbook.xml`'s sheet list and
    * the workbook relationships, not by file position.
    */
  def readSheet(spark: SparkSession, path: String, sheetName: String,
                startRow: Int = 1): DataFrame = {
    val (schema, data) = parseTyped(path, sheetName, startRow)
    spark.createDataFrame(data.map(Row.fromSeq).asJava, schema)
  }

  /** Parse a sheet into (inferred schema, coerced JVM values) — the
    * shared front-end for [[read]]/[[readSheet]] and the DataSource V2
    * provider ([[XlsxDataSource]]), which needs schema and rows
    * separately. `sheet` is an all-digits 1-based index ("2") or a
    * sheet name ("Supplementary Table 2"); rows with sheet row number
    * < `startRow` are dropped before header promotion.
    */
  def parseTyped(path: String, sheet: String, startRow: Int = 1): (StructType, Vector[Vector[Any]]) = {
    val zf = new ZipFile(path)
    try {
      val shared = Option(zf.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zf.getInputStream(e).readAllBytes()))
        .getOrElse(Vector.empty)
      val entry = resolveSheetEntry(zf, path, sheet)
      val rows = parseSheet(zf.getInputStream(entry).readAllBytes(), shared)
        .collect { case (r, cells) if r >= startRow => cells }
      require(rows.nonEmpty,
        s"$path sheet '$sheet' has no rows at or after startRow=$startRow — no header row")
      val header = rows.head.map(_.map(_.toString.trim).getOrElse(""))
      val width = rows.map(_.length).max
      val names = (0 until width).map(i =>
        if (i < header.length && header(i).nonEmpty) header(i) else s"_c$i")
      val body = rows.tail.map(r => r.padTo(width, None))
      val types = (0 until width).map(i => inferType(body.map(_(i))))
      val schema = StructType(names.zip(types).map { case (n, t) =>
        StructField(n, t, nullable = true)
      })
      val data = body.map { r =>
        (0 until width).map(i => coerce(r(i), types(i))).toVector
      }
      (schema, data)
    } finally zf.close()
  }

  // ---- sheet resolution --------------------------------------------

  /** (name, worksheet zip entry) per sheet, in workbook order —
    * `xl/workbook.xml`'s `<sheet name= r:id=>` list joined to
    * `xl/_rels/workbook.xml.rels`' Id→Target map. Entries whose rels
    * target can't be resolved fall back to positional
    * `xl/worksheets/sheetN.xml`.
    */
  def sheetNames(path: String): Vector[String] = {
    val zf = new ZipFile(path)
    try workbookSheets(zf).map(_._1) finally zf.close()
  }

  private def workbookSheets(zf: ZipFile): Vector[(String, String)] = {
    val rels: Map[String, String] = Option(zf.getEntry("xl/_rels/workbook.xml.rels"))
      .map { e =>
        val rd = XMLInputFactory.newInstance()
          .createXMLStreamReader(new ByteArrayInputStream(zf.getInputStream(e).readAllBytes()))
        val m = Map.newBuilder[String, String]
        while (rd.hasNext) {
          if (rd.next() == XMLStreamConstants.START_ELEMENT &&
              rd.getLocalName == "Relationship") {
            val id = Option(rd.getAttributeValue(null, "Id"))
            val target = Option(rd.getAttributeValue(null, "Target"))
            for (i <- id; t <- target)
              m += i -> (if (t.startsWith("/")) t.drop(1)
                         else if (t.startsWith("xl/")) t
                         else s"xl/$t")
          }
        }
        rd.close()
        m.result()
      }.getOrElse(Map.empty)
    Option(zf.getEntry("xl/workbook.xml")).map { e =>
      val rd = XMLInputFactory.newInstance()
        .createXMLStreamReader(new ByteArrayInputStream(zf.getInputStream(e).readAllBytes()))
      val out = Vector.newBuilder[(String, String)]
      var pos = 0
      while (rd.hasNext) {
        if (rd.next() == XMLStreamConstants.START_ELEMENT &&
            rd.getLocalName == "sheet") {
          pos += 1
          val name = Option(rd.getAttributeValue(null, "name")).getOrElse(s"Sheet$pos")
          // r:id is namespace-qualified — match by local name
          val rid = (0 until rd.getAttributeCount)
            .find(i => rd.getAttributeLocalName(i) == "id")
            .map(rd.getAttributeValue)
          val target = rid.flatMap(rels.get)
            .getOrElse(s"xl/worksheets/sheet$pos.xml")
          out += name -> target
        }
      }
      rd.close()
      out.result()
    }.getOrElse(Vector.empty)
  }

  /** `sheet` all-digits ⇒ 1-based position in workbook order (falling
    * back to literal `sheetN.xml` for workbooks without a manifest);
    * otherwise a sheet NAME looked up in `xl/workbook.xml`.
    */
  private def resolveSheetEntry(zf: ZipFile, path: String, sheet: String): ZipEntry = {
    val sheets = workbookSheets(zf)
    val target: String =
      if (sheet.nonEmpty && sheet.forall(_.isDigit)) {
        val idx = sheet.toInt
        if (idx >= 1 && idx <= sheets.length) sheets(idx - 1)._2
        else s"xl/worksheets/sheet$idx.xml"
      } else sheets.collectFirst { case (n, t) if n == sheet => t }
        .getOrElse(throw new IllegalArgumentException(
          s"$path has no sheet named '$sheet' — workbook sheets: ${sheets.map(_._1).mkString("'", "', '", "'")}"))
    Option(zf.getEntry(target)).getOrElse(
      throw new IllegalArgumentException(s"$path: worksheet part $target missing for sheet '$sheet'"))
  }

  // ---- parsing ------------------------------------------------------

  /** Cell payload straight out of the XML: typed enough to infer on. */
  private sealed trait Cell { def toString: String }
  private case class NumCell(v: Double) extends Cell {
    override def toString: String =
      if (v == v.toLong.toDouble) v.toLong.toString else v.toString
  }
  private case class BoolCell(v: Boolean) extends Cell { override def toString: String = v.toString }
  private case class StrCell(v: String) extends Cell { override def toString: String = v }

  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val rd = XMLInputFactory.newInstance()
      .createXMLStreamReader(new ByteArrayInputStream(bytes))
    val out = Vector.newBuilder[String]
    var inSi = false
    val sb = new StringBuilder
    while (rd.hasNext) {
      rd.next() match {
        case XMLStreamConstants.START_ELEMENT if rd.getLocalName == "si" =>
          inSi = true; sb.clear()
        case XMLStreamConstants.END_ELEMENT if rd.getLocalName == "si" =>
          inSi = false; out += sb.toString
        case XMLStreamConstants.CHARACTERS if inSi =>
          sb ++= rd.getText
        case _ => ()
      }
    }
    rd.close()
    out.result()
  }

  /** Sparse sheet XML → (1-based sheet row number, dense row-major
    * Option[Cell] grid). Row numbers come from the row `r` attribute
    * (sequential fallback) so `startRow` counts PHYSICAL sheet rows
    * even when empty rows are omitted from the XML. Handles
    * shared strings (t="s"), inline strings (t="inlineStr"), formula
    * strings (t="str"), booleans (t="b") and numeric cells; missing
    * cells (gaps in the r="A1" refs) become None.
    */
  private def parseSheet(bytes: Array[Byte], shared: Vector[String]): Vector[(Int, Vector[Option[Cell]])] = {
    val rd = XMLInputFactory.newInstance()
      .createXMLStreamReader(new ByteArrayInputStream(bytes))
    val rows = Vector.newBuilder[(Int, Vector[Option[Cell]])]
    var row: mutable.ArrayBuffer[Option[Cell]] = null
    var rowNum = 0
    var cellType = ""
    var cellColIdx = -1
    var inV = false
    val text = new StringBuilder
    while (rd.hasNext) {
      rd.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          rd.getLocalName match {
            case "row" =>
              row = mutable.ArrayBuffer.empty
              rowNum = Option(rd.getAttributeValue(null, "r"))
                .flatMap(_.toIntOption).getOrElse(rowNum + 1)
            case "c" =>
              cellType = Option(rd.getAttributeValue(null, "t")).getOrElse("")
              cellColIdx = Option(rd.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(row.length)
            case "v" | "t" => inV = true; text.clear()
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inV =>
          text ++= rd.getText
        case XMLStreamConstants.END_ELEMENT =>
          rd.getLocalName match {
            case "v" | "t" => inV = false
            case "c" =>
              val raw = text.toString
              val cell: Option[Cell] =
                if (raw.isEmpty && cellType != "inlineStr") None
                else cellType match {
                  case "s" => Some(StrCell(shared(raw.trim.toInt)))
                  case "b" => Some(BoolCell(raw.trim == "1"))
                  case "str" | "inlineStr" => Some(StrCell(raw))
                  case _ => raw.trim.toDoubleOption.map(NumCell).orElse(Some(StrCell(raw)))
                }
              while (row.length < cellColIdx) row += None
              if (row.length == cellColIdx) row += cell else row(cellColIdx) = cell
              text.clear()
            case "row" => rows += rowNum -> row.toVector
            case _ => ()
          }
        case _ => ()
      }
    }
    rd.close()
    rows.result()
  }

  /** "BC23" → 0-based column index 54. */
  private def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def inferType(cells: Seq[Option[Cell]]): DataType = {
    val present = cells.flatten
    if (present.isEmpty) StringType
    else if (present.forall(_.isInstanceOf[BoolCell])) BooleanType
    else if (present.forall { case NumCell(v) => v == v.toLong.toDouble && v.abs < 9.2e18; case _ => false }) LongType
    else if (present.forall(_.isInstanceOf[NumCell])) DoubleType
    else StringType
  }

  private def coerce(c: Option[Cell], t: DataType): Any = c match {
    case None => null
    case Some(cell) => (cell, t) match {
      case (NumCell(v), LongType) => v.toLong
      case (NumCell(v), DoubleType) => v
      case (BoolCell(v), BooleanType) => v
      case (other, _) => other.toString
    }
  }

  // ---- fixture writer ----------------------------------------------

  /** Write a minimal single-sheet xlsx (sharedStrings for text cells,
    * plain numeric cells otherwise) — enough for round-trip tests and
    * small exports; real bulk sinks are parquet/ORC.
    */
  def write(path: String, header: Seq[String], rows: Seq[Seq[Any]]): Unit =
    writeWorkbook(path, Seq(("Sheet1", header +: rows)))

  /** Multi-sheet fixture writer: (sheet name, rows incl. header) per
    * sheet, in workbook order — exercises the named-sheet resolution
    * path ([[readSheet]]) the reference's manuscript ingest needs.
    * sharedStrings is workbook-global, as in real files.
    */
  def writeWorkbook(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    val strings = mutable.LinkedHashMap.empty[String, Int]
    def sidx(s: String): Int = strings.getOrElseUpdate(s, strings.size)

    def cellXml(ref: String, v: Any): String = v match {
      case null => ""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
      case s => s"""<c r="$ref" t="s"><v>${sidx(s.toString)}</v></c>"""
    }
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def sheetXml(rows: Seq[Seq[Any]]): String = {
      val body = rows.zipWithIndex.map { case (r, ri) =>
        val cells = r.zipWithIndex.map { case (v, ci) => cellXml(s"${colRef(ci)}${ri + 1}", v) }
        s"""<row r="${ri + 1}">${cells.mkString}</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>""".stripMargin
    }
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    // render sheets FIRST so sharedStrings is fully populated
    val sheetParts = sheets.zipWithIndex.map { case ((_, rows), i) =>
      s"xl/worksheets/sheet${i + 1}.xml" -> sheetXml(rows)
    }
    val ssXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">${strings.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString}</sst>""".stripMargin
    val sheetDecls = sheets.zipWithIndex.map { case ((name, _), i) =>
      s"""<sheet name="${esc(name).replace("\"", "&quot;")}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val workbookXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>$sheetDecls</sheets></workbook>""".stripMargin
    val relDecls = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    val wbRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$relDecls<Relationship Id="rId${sheets.size + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>""".stripMargin
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""".stripMargin
    val sheetOverrides = sheets.indices.map { i =>
      s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>"""
    }.mkString
    val contentTypes =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>$sheetOverrides<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>""".stripMargin
    val zos = new ZipOutputStream(new FileOutputStream(path))
    try {
      (Seq(
        "[Content_Types].xml" -> contentTypes,
        "_rels/.rels" -> rootRels,
        "xl/workbook.xml" -> workbookXml,
        "xl/_rels/workbook.xml.rels" -> wbRels) ++
        sheetParts :+ ("xl/sharedStrings.xml" -> ssXml)
      ).foreach { case (name, content) =>
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
    } finally zos.close()
  }
}
