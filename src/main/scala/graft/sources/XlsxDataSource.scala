package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 registration of the JDK-only xlsx parser, so the
  * reference's manuscript-supplement ingestion
  * (reference/scripts/import/temp-import-all-manuscript-files.R:9-14,
  * `openxlsx::read.xlsx`) reads with the standard Spark surface:
  *
  * {{{
  * spark.read.format("xlsx").option("sheet", 2).load(path)
  * spark.read.format("xlsx")
  *   .option("sheet", "Supplementary Table 2")   // by NAME (workbook.xml)
  *   .option("startRow", 2)                      // openxlsx startRow=
  *   .load(path)
  * }}}
  *
  * Scale shape: an xlsx is a single non-splittable zip stream and the
  * reference uses it only for small dimension tables, so the scan is
  * ONE input partition whose reader parses the file where the task
  * runs (schema inference parses once on the driver). Bulk columnar
  * data belongs to the parquet/ORC paths.
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "xlsx"

  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("xlsx source requires a path: .load(path)"))

  // sheet may be a 1-based index ("2") or a sheet NAME; startRow is
  // the openxlsx `startRow=` skip (1-based first physical row kept)
  private def sheetOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("sheet")).getOrElse("1")

  private def startRowOf(options: CaseInsensitiveStringMap): Int =
    Option(options.get("startRow")).map(_.toInt).getOrElse(1)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    XlsxReader.parseTyped(pathOf(options), sheetOf(options), startRowOf(options))._1

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new XlsxTable(schema, pathOf(opts), sheetOf(opts), startRowOf(opts))
  }
}

private[sources] class XlsxTable(tableSchema: StructType, path: String,
                                 sheet: String, startRow: Int)
    extends Table with SupportsRead {

  override def name(): String = s"xlsx:$path!$sheet@$startRow"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new XlsxScan(tableSchema, path, sheet, startRow)
    }
}

private[sources] class XlsxScan(schema: StructType, path: String,
                                sheet: String, startRow: Int)
    extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(XlsxPartition(path, sheet, startRow))

  override def createReaderFactory(): PartitionReaderFactory =
    new XlsxReaderFactory(schema)
}

private[sources] case class XlsxPartition(path: String, sheet: String, startRow: Int) extends InputPartition

private[sources] class XlsxReaderFactory(schema: StructType)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[XlsxPartition]
    // re-parse in the task (files are small by contract); the header
    // may legitimately differ from a user-supplied schema only in
    // names, so values are coerced positionally.
    val rows = XlsxReader.parseTyped(p.path, p.sheet, p.startRow)._2.iterator
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!rows.hasNext) false
        else {
          val vs = rows.next()
          current = new GenericInternalRow(
            schema.fields.zipWithIndex.map { case (f, i) =>
              val v = if (i < vs.length) vs(i) else null
              (v, f.dataType) match {
                case (null, _) => null
                case (s, StringType) => UTF8String.fromString(s.toString)
                case (other, _) => other
              }
            }.asInstanceOf[Array[Any]])
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
