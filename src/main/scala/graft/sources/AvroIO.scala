package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.avro.util.Utf8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file IO built directly on avro-core (the
  * environment ships `avro-1.12.1` but not the `spark-avro` connector
  * module, so the format surface is provided here, the same way
  * [[XlsxReader]] provides xlsx): Spark↔Avro schema mapping, a
  * distributed writer, and the record→InternalRow decode used by
  * [[AvroDataSource]].
  *
  * Scale shape: Avro is a ROW format with 16-byte sync markers every
  * block, so files are byte-range splittable — the scan seeks to the
  * first sync past the split start and reads until the first sync past
  * the split end, exactly the parquet-row-group discipline at the
  * container level. Writes go one file per partition (no driver
  * funnel); timestamps map to the timestamp-micros logical type and
  * dates to the date logical type, so values round-trip exactly.
  */
object AvroIO {

  // ---- schema mapping ----------------------------------------------------

  private def avroScalar(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType => // session-independent wall time
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(el, containsNull) =>
      Schema.createArray(if (containsNull) nullable(avroScalar(el)) else avroScalar(el))
    case other =>
      throw new IllegalArgumentException(s"avro source: unsupported type $other")
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))

  def toAvroSchema(schema: StructType, name: String = "spark_record"): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroScalar(f.dataType)
      new Schema.Field(f.name, if (f.nullable) nullable(base) else base,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def unwrapUnion(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"avro source: only [null, T] unions supported, got $s")
      (nonNull.head, true)
    } else (s, false)

  private def sparkScalar(s: Schema): DataType = (s.getType, s.getLogicalType) match {
    case (Schema.Type.BOOLEAN, _) => BooleanType
    case (Schema.Type.INT, _: LogicalTypes.Date) => DateType
    case (Schema.Type.INT, _) => IntegerType
    case (Schema.Type.LONG, _: LogicalTypes.TimestampMicros) => TimestampType
    case (Schema.Type.LONG, _: LogicalTypes.LocalTimestampMicros) => TimestampNTZType
    case (Schema.Type.LONG, _) => LongType
    case (Schema.Type.FLOAT, _) => FloatType
    case (Schema.Type.DOUBLE, _) => DoubleType
    case (Schema.Type.STRING, _) => StringType
    case (Schema.Type.BYTES, _) => BinaryType
    case (Schema.Type.ARRAY, _) =>
      val (el, elNullable) = unwrapUnion(s.getElementType)
      ArrayType(sparkScalar(el), containsNull = elNullable)
    case other =>
      throw new IllegalArgumentException(s"avro source: unsupported avro type $other")
  }

  def toSparkSchema(schema: Schema): StructType =
    StructType(schema.getFields.asScala.map { f =>
      val (base, isNullable) = unwrapUnion(f.schema())
      StructField(f.name(), sparkScalar(base), nullable = isNullable)
    }.toArray)

  // ---- write -------------------------------------------------------------

  /** Distributed write: one container file per partition under `dir`
    * (`part-NNNNN.avro`), through the Hadoop FileSystem API. */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema).toString
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new Path(dir)
    val fs = out.getFileSystem(serConf.value)
    fs.mkdirs(out)
    df.queryExecution.toRdd.foreachPartition { iter: Iterator[InternalRow] =>
      val avroSchema = new Schema.Parser().parse(avroJson)
      val pid = TaskContext.getPartitionId()
      val path = new Path(dir, f"part-$pid%05d.avro")
      val pfs = path.getFileSystem(serConf.value)
      val stream = pfs.create(path, true)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
      writer.create(avroSchema, stream)
      try {
        val fieldSchemas = avroSchema.getFields.asScala.map(f => unwrapUnion(f.schema())._1).toArray
        iter.foreach { row =>
          val rec = new GenericData.Record(avroSchema)
          var i = 0
          while (i < schema.length) {
            rec.put(i, toAvroValue(row, i, schema(i).dataType, fieldSchemas(i)))
            i += 1
          }
          writer.append(rec)
        }
      } finally writer.close()
    }
  }

  private def toAvroValue(row: InternalRow, i: Int, dt: DataType, fieldSchema: Schema): AnyRef =
    if (row.isNullAt(i)) null
    else dt match {
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
      case LongType | TimestampType | TimestampNTZType =>
        java.lang.Long.valueOf(row.getLong(i))
      case FloatType => java.lang.Float.valueOf(row.getFloat(i))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case StringType => row.getUTF8String(i).toString
      case BinaryType => ByteBuffer.wrap(row.getBinary(i))
      case ArrayType(el, _) =>
        val arr = row.getArray(i)
        val out = new java.util.ArrayList[AnyRef](arr.numElements())
        var j = 0
        while (j < arr.numElements()) {
          out.add(if (arr.isNullAt(j)) null else (el match {
            case IntegerType => java.lang.Integer.valueOf(arr.getInt(j))
            case LongType => java.lang.Long.valueOf(arr.getLong(j))
            case FloatType => java.lang.Float.valueOf(arr.getFloat(j))
            case DoubleType => java.lang.Double.valueOf(arr.getDouble(j))
            case StringType => arr.getUTF8String(j).toString
            case BooleanType => java.lang.Boolean.valueOf(arr.getBoolean(j))
            case other => throw new IllegalArgumentException(s"avro array element $other")
          }))
          j += 1
        }
        out
      case other => throw new IllegalArgumentException(s"avro source: unsupported type $other")
    }

  // ---- read --------------------------------------------------------------

  /** Read the writer schema from a container file's header. */
  def readFileSchema(path: String, conf: Configuration): Schema = {
    val in = new FsInput(new Path(path), conf)
    val r = new DataFileReader(in, new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Iterate the records of one byte-range split of a container file:
    * records from the first sync past `start` (exclusive of the
    * header block when start = 0 is handled by sync(0) → first block)
    * until the first sync at or past `start + length` — each record
    * belongs to exactly one split, the standard Avro split contract.
    * The decode projects only `readSchema`'s columns (column pruning).
    */
  def splitRows(path: String, start: Long, length: Long, conf: Configuration,
                fileSchema: Schema, readSchema: StructType): Iterator[InternalRow] = {
    val in = new FsInput(new Path(path), conf)
    val reader = new DataFileReader(in, new GenericDatumReader[GenericRecord](fileSchema))
    reader.sync(start)
    val ordinals = readSchema.fields.map { f =>
      val fld = fileSchema.getField(f.name)
      require(fld != null, s"avro source: column '${f.name}' not in file schema")
      fld.pos()
    }
    val dts = readSchema.fields.map(_.dataType)
    // hoisted: inside the anonymous Iterator, a bare `length` would
    // resolve to Iterator.length (self-recursion), not the parameter
    val end = start + length
    new Iterator[InternalRow] {
      private var done = false
      override def hasNext: Boolean = {
        if (!done && (!reader.hasNext || reader.pastSync(end))) {
          done = true
          reader.close()
        }
        !done
      }
      override def next(): InternalRow = {
        val rec = reader.next()
        val vals = new Array[Any](ordinals.length)
        var i = 0
        while (i < ordinals.length) {
          vals(i) = fromAvroValue(rec.get(ordinals(i)), dts(i))
          i += 1
        }
        new GenericInternalRow(vals)
      }
    }
  }

  private def fromAvroValue(v: AnyRef, dt: DataType): Any = v match {
    case null => null
    case u: Utf8 => UTF8String.fromBytes(u.getBytes, 0, u.getByteLength)
    case s: java.lang.CharSequence => UTF8String.fromString(s.toString)
    case b: ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case l: java.util.Collection[_] =>
      val out = new Array[Any](l.size())
      val et = dt.asInstanceOf[ArrayType].elementType
      var i = 0
      val it = l.iterator()
      while (it.hasNext) { out(i) = fromAvroValue(it.next().asInstanceOf[AnyRef], et); i += 1 }
      new GenericArrayData(out): ArrayData
    case other => other // Boolean/Int/Long/Float/Double box straight through
  }
}
