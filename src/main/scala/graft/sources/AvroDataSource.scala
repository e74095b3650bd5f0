package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 Avro reader over [[AvroIO]] (the connector module is
  * not on this classpath; avro-core is):
  *
  * {{{
  * AvroIO.write(df, dir)                          // distributed write
  * spark.read.format("avro").load(dir)            // splittable scan
  * }}}
  *
  * Scale shape, unlike the single-partition xlsx dimension format:
  *  - every `.avro` file is SPLIT into byte ranges of
  *    `spark.sql.files.maxPartitionBytes` and each split reads only
  *    its own sync-delimited blocks — a 1 TB avro lake scans with
  *    full parallelism;
  *  - column pruning is pushed into the scan
  *    (SupportsPushDownRequiredColumns): the decode materializes only
  *    requested fields, and `readSchema()` reflects the pruning the
  *    same way the parquet scan's ReadSchema does. Filters stay
  *    Spark-side by design — Avro is a row format with no column
  *    statistics, so there is nothing sound to push a predicate into.
  */
class AvroDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "avro"

  override def supportsExternalMetadata(): Boolean = true

  private def filesOf(path: String): Seq[String] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val stat = fs.getFileStatus(p)
    val files =
      if (stat.isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath)
          .filter(f => f.getName.endsWith(".avro") && !f.getName.startsWith("_"))
          .sortBy(_.getName).toSeq
      else Seq(p)
    require(files.nonEmpty, s"avro source: no .avro files under $path")
    files.map(_.toString)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("avro source requires a path: .load(path)"))
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    AvroIO.toSparkSchema(AvroIO.readFileSchema(filesOf(path).head, conf))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new AvroTable(schema, filesOf(opts.get("path")))
  }
}

private[sources] class AvroTable(tableSchema: StructType, files: Seq[String])
    extends Table with SupportsRead {

  override def name(): String = s"avro:${files.head}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, files)
}

private[sources] class AvroScanBuilder(fullSchema: StructType, files: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve this source's field order; Spark re-projects above
    required = StructType(fullSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new AvroScan(required, files)
}

private[sources] class AvroScan(readSchemaV: StructType, files: Seq[String])
    extends Scan with Batch {

  override def readSchema(): StructType = readSchemaV
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    files.flatMap { f =>
      val p = new Path(f)
      val len = p.getFileSystem(conf).getFileStatus(p).getLen
      (0L until math.max(len, 1L) by maxSplit).map { start =>
        AvroSplit(f, start, math.min(maxSplit, len - start))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(readSchemaV,
      new SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

private[sources] case class AvroSplit(path: String, start: Long, length: Long)
    extends InputPartition

private[sources] class AvroReaderFactory(schema: StructType,
                                         conf: SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[AvroSplit]
    val fileSchema = AvroIO.readFileSchema(s.path, conf.value)
    val rows = AvroIO.splitRows(s.path, s.start, s.length, conf.value, fileSchema, schema)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!rows.hasNext) false
        else { current = rows.next(); true }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
