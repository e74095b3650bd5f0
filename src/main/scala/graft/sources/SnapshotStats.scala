package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Snapshot DATA-SKIPPING: per-file min/max column statistics harvested
  * from parquet FOOTERS (metadata-only — no data pages are read) into a
  * generation-local manifest, plus the sound interval algebra a pruned
  * read path evaluates against it. At 100 TB the difference between
  * "open every file" and "open the files whose [min,max] interval can
  * satisfy the predicate" IS the query time on selective predicates —
  * this is the lakehouse-core capability (Delta/Iceberg file skipping)
  * expressed over the engine's own commit-marker snapshot protocol,
  * and the read-side consumer of [[graft.operators.Layout]]'s Z-order
  * clustering (which exists precisely to make these per-file intervals
  * tight in BOTH clustered dimensions).
  *
  * Soundness: pruning may only drop a file when NO row in it can
  * satisfy the predicate. Every comparison here mirrors the engine
  * that wrote the stats — numerics compare exactly (BigDecimal, no
  * double round-trip), strings compare in UNSIGNED UTF-8 BYTE order,
  * which is both parquet-mr's BINARY stats comparator and Spark's
  * UTF8String ordering (Java String.compareTo is UTF-16 order and
  * disagrees on supplementary characters — deliberately not used).
  * A file with no usable stats for a referenced column is always
  * kept, and [[Snapshot.readWhere]] re-applies the full predicate
  * after pruning, so pruning is a pure performance optimization:
  * results are hash-identical to the unpruned scan by construction,
  * and SnapshotSpec asserts both halves (fewer files opened AND
  * identical results).
  */
object SnapshotStats {

  /** Hadoop Configuration is a Writable, not Serializable; Spark's own
    * wrapper is `private[spark]`, so ship footers-harvest tasks their
    * conf through this minimal writable-backed envelope.
    */
  private final class SerializableHadoopConf(@transient var conf: Configuration)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject(); conf.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  /** One column's aggregated stats within one file.
    *
    * @param typ      "l" (integral/date/timestamp-micros), "d", or "s"
    * @param hasValue false ⇔ provably all-null in this file
    * @param min/max  present iff hasValue (typed per `typ`)
    * @param nulls    null count, or -1 when any rowgroup left it unset
    */
  final case class ColStats(typ: String, hasValue: Boolean,
                            min: Option[Any], max: Option[Any], nulls: Long)

  /** Per-file manifest row: absolute path, row count, per-column stats.
    * Columns with unusable stats (unsupported type, missing rowgroup
    * stats, NaN-polluted double bounds) are simply absent — absent
    * means "never prune on this column for this file".
    */
  final case class FileStats(file: String, rows: Long,
                             cols: Map[String, ColStats])

  // ---------------------------------------------------------------------
  // Pruning predicates
  // ---------------------------------------------------------------------

  /** The pruning predicate algebra. Constants must be Long/Int (integral
    * columns), Double/Float (floating columns), or String — matching the
    * column's PHYSICAL type as harvested (date/timestamp columns are
    * projected to integral days/micros by the caller before the write,
    * the q208 discipline). `toColumn` is the exact row-level filter the
    * pruned scan re-applies, so an over-conservative `mayMatch` can
    * never change results — only open more files.
    */
  sealed trait StatsPred {
    /** Row-level Spark filter — applied after pruning, always. */
    def toColumn: Column
    /** May any row of a file with these stats satisfy this predicate? */
    def mayMatch(fs: FileStats): Boolean
  }

  object StatsPred {
    final case class Between(column: String, lo: Any, hi: Any) extends StatsPred {
      def toColumn: Column = col(column) >= lit(lo) && col(column) <= lit(hi)
      def mayMatch(fs: FileStats): Boolean = fs.cols.get(column) match {
        case None => true // no stats — never prune
        case Some(cs) if !cs.hasValue => false // provably all-null
        case Some(cs) =>
          cmp(cs.max.get, lo) >= 0 && cmp(cs.min.get, hi) <= 0
      }
    }
    final case class EqualTo(column: String, v: Any) extends StatsPred {
      private val b = Between(column, v, v)
      def toColumn: Column = col(column) === lit(v)
      def mayMatch(fs: FileStats): Boolean = b.mayMatch(fs)
    }
    final case class GtEq(column: String, v: Any) extends StatsPred {
      def toColumn: Column = col(column) >= lit(v)
      def mayMatch(fs: FileStats): Boolean = fs.cols.get(column) match {
        case None => true
        case Some(cs) if !cs.hasValue => false
        case Some(cs) => cmp(cs.max.get, v) >= 0
      }
    }
    final case class LtEq(column: String, v: Any) extends StatsPred {
      def toColumn: Column = col(column) <= lit(v)
      def mayMatch(fs: FileStats): Boolean = fs.cols.get(column) match {
        case None => true
        case Some(cs) if !cs.hasValue => false
        case Some(cs) => cmp(cs.min.get, v) <= 0
      }
    }
    final case class IsNull(column: String) extends StatsPred {
      def toColumn: Column = col(column).isNull
      def mayMatch(fs: FileStats): Boolean = fs.cols.get(column) match {
        case None => true
        case Some(cs) => cs.nulls != 0L // -1 (unknown) keeps the file
      }
    }
    final case class And(l: StatsPred, r: StatsPred) extends StatsPred {
      def toColumn: Column = l.toColumn && r.toColumn
      def mayMatch(fs: FileStats): Boolean = l.mayMatch(fs) && r.mayMatch(fs)
    }
    final case class Or(l: StatsPred, r: StatsPred) extends StatsPred {
      def toColumn: Column = l.toColumn || r.toColumn
      def mayMatch(fs: FileStats): Boolean = l.mayMatch(fs) || r.mayMatch(fs)
    }
  }

  /** Exact cross-type comparison: numerics via BigDecimal (a Long near
    * 2^63 survives; no double round-trip), strings in unsigned UTF-8
    * byte order (parquet's BINARY comparator AND Spark's UTF8String
    * order). Mixing a string with a numeric is a caller bug — fail
    * loudly rather than prune unsoundly.
    */
  private[graft] def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => utf8Cmp(x, y)
    case (_: String, _) | (_, _: String) =>
      throw new IllegalArgumentException(
        s"stats predicate mixes string and numeric: $a vs $b")
    case _ => toBig(a).compareTo(toBig(b))
  }

  private def toBig(v: Any): java.math.BigDecimal = v match {
    case x: Long => java.math.BigDecimal.valueOf(x)
    case x: Int => java.math.BigDecimal.valueOf(x.toLong)
    case x: Short => java.math.BigDecimal.valueOf(x.toLong)
    case x: Byte => java.math.BigDecimal.valueOf(x.toLong)
    case x: Double => new java.math.BigDecimal(x)
    case x: Float => new java.math.BigDecimal(x.toDouble)
    case other => throw new IllegalArgumentException(
      s"unsupported stats predicate constant: $other (${other.getClass})")
  }

  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  // ---------------------------------------------------------------------
  // Footer harvest (metadata-only, distributed)
  // ---------------------------------------------------------------------

  /** Harvest per-file stats for every supported top-level column of
    * every parquet file under `dataDir`. Footer reads only — O(files)
    * metadata fetches, zero data pages — distributed over the cluster
    * (one task per file batch), collected to the driver exactly like a
    * table-format transaction log: the manifest is files-sized, not
    * data-sized.
    */
  def harvest(spark: SparkSession, dataDir: String): Seq[FileStats] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dataDir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dataDir)).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .sorted
    if (files.isEmpty) return Seq.empty
    val sConf = new SerializableHadoopConf(new Configuration(conf))
    spark.sparkContext
      .parallelize(files, math.min(files.size, 64))
      .map(f => statsOfFile(f, sConf.conf))
      .collect()
      .toSeq
      .sortBy(_.file)
  }

  private def statsOfFile(file: String, conf: Configuration): FileStats = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      // supported top-level primitive columns → manifest type tag
      val typeOf: Map[String, String] = schema.getFields.asScala.flatMap { f =>
        if (!f.isPrimitive) None
        else {
          val p = f.asPrimitiveType()
          val ann = p.getLogicalTypeAnnotation
          p.getPrimitiveTypeName match {
            case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
              Some(f.getName -> "l")
            case PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
              Some(f.getName -> "d")
            case PrimitiveTypeName.BINARY
                if ann.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] =>
              Some(f.getName -> "s")
            case _ => None
          }
        }
      }.toMap
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // fold rowgroup stats per column; any unusable rowgroup poisons
      // the column for this file (absent from the manifest → kept)
      val byCol = scala.collection.mutable.Map[String, Option[ColStats]]()
      blocks.foreach { b =>
        b.getColumns.asScala.foreach { cc =>
          val name = cc.getPath.toDotString
          typeOf.get(name).foreach { t =>
            val st = cc.getStatistics
            val chunk: Option[ColStats] =
              if (st == null || st.isEmpty) None
              else {
                val nulls = if (st.isNumNullsSet) st.getNumNulls else -1L
                if (!st.hasNonNullValue) {
                  // all-null is only provable with a trusted null count
                  if (nulls >= 0) Some(ColStats(t, hasValue = false, None, None, nulls))
                  else None
                } else {
                  val mn = fromStats(st.genericGetMin.asInstanceOf[AnyRef], t)
                  val mx = fromStats(st.genericGetMax.asInstanceOf[AnyRef], t)
                  (mn, mx) match {
                    case (Some(a), Some(z)) =>
                      Some(ColStats(t, hasValue = true, Some(a), Some(z), nulls))
                    case _ => None
                  }
                }
              }
            val merged: Option[ColStats] = byCol.get(name) match {
              case None => chunk // first rowgroup for this column
              case Some(None) => None // already poisoned
              case Some(Some(acc)) => chunk.map(c => mergeCol(acc, c))
            }
            byCol(name) = merged
          }
        }
      }
      FileStats(file, rows,
        byCol.toMap.collect { case (k, Some(v)) => k -> v })
    } finally reader.close()
  }

  private def mergeCol(a: ColStats, b: ColStats): ColStats = {
    val nulls = if (a.nulls < 0 || b.nulls < 0) -1L else a.nulls + b.nulls
    (a.hasValue, b.hasValue) match {
      case (false, false) => ColStats(a.typ, hasValue = false, None, None, nulls)
      case (true, false) => a.copy(nulls = nulls)
      case (false, true) => b.copy(nulls = nulls)
      case (true, true) => ColStats(a.typ, hasValue = true,
        Some(if (cmp(a.min.get, b.min.get) <= 0) a.min.get else b.min.get),
        Some(if (cmp(a.max.get, b.max.get) >= 0) a.max.get else b.max.get),
        nulls)
    }
  }

  /** Parquet generic stats value → manifest value. Doubles with NaN
    * bounds are unusable (NaN has no place in an interval order).
    */
  private def fromStats(v: AnyRef, typ: String): Option[Any] = typ match {
    case "l" => v match {
      case x: java.lang.Integer => Some(x.longValue)
      case x: java.lang.Long => Some(x.longValue)
      case _ => None
    }
    case "d" => v match {
      case x: java.lang.Float =>
        if (x.isNaN) None else Some(x.doubleValue)
      case x: java.lang.Double =>
        if (x.isNaN) None else Some(x.doubleValue)
      case _ => None
    }
    case "s" => v match {
      case b: org.apache.parquet.io.api.Binary =>
        Some(new String(b.getBytes, UTF_8))
      case _ => None
    }
  }

  // ---------------------------------------------------------------------
  // Manifest (de)serialization — line format, base64 string bounds
  // ---------------------------------------------------------------------

  /** Serialize a manifest. Line-oriented, dependency-free, and string
    * bounds ride base64 so no data byte can corrupt the framing:
    * {{{
    * F <tab> file <tab> rows
    * C <tab> file <tab> col <tab> typ <tab> hasValue <tab> nulls <tab> b64(min) <tab> b64(max)
    * }}}
    */
  private[graft] def renderManifest(stats: Seq[FileStats]): String = {
    def enc(v: Any, t: String): String = t match {
      case "s" => Base64.getEncoder.encodeToString(v.asInstanceOf[String].getBytes(UTF_8))
      case "d" =>
        // exact round-trip: raw IEEE bits, not a decimal render
        java.lang.Long.toHexString(
          java.lang.Double.doubleToRawLongBits(v.asInstanceOf[Double]))
      case _ => v.asInstanceOf[Long].toString
    }
    val sb = new StringBuilder
    stats.foreach { f =>
      sb.append("F\t").append(f.file).append('\t').append(f.rows).append('\n')
      f.cols.toSeq.sortBy(_._1).foreach { case (c, cs) =>
        sb.append("C\t").append(f.file).append('\t').append(c).append('\t')
          .append(cs.typ).append('\t').append(cs.hasValue).append('\t')
          .append(cs.nulls).append('\t')
          .append(cs.min.map(enc(_, cs.typ)).getOrElse("-")).append('\t')
          .append(cs.max.map(enc(_, cs.typ)).getOrElse("-")).append('\n')
      }
    }
    sb.toString
  }

  private[graft] def parseManifest(text: String): Seq[FileStats] = {
    def dec(s: String, t: String): Any = t match {
      case "s" => new String(Base64.getDecoder.decode(s), UTF_8)
      case "d" => java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(s, 16))
      case _ => s.toLong
    }
    val rows = scala.collection.mutable.LinkedHashMap[String, Long]()
    val cols = scala.collection.mutable.LinkedHashMap[String, Vector[(String, ColStats)]]()
    text.linesIterator.filter(_.nonEmpty).foreach { line =>
      val p = line.split('\t')
      p(0) match {
        case "F" => rows(p(1)) = p(2).toLong
        case "C" =>
          val t = p(3)
          val hasValue = p(4).toBoolean
          val cs = ColStats(t, hasValue, nulls = p(5).toLong,
            min = if (p(6) == "-") None else Some(dec(p(6), t)),
            max = if (p(7) == "-") None else Some(dec(p(7), t)))
          cols(p(1)) = cols.getOrElse(p(1), Vector.empty) :+ (p(2) -> cs)
        case _ => // forward-compatible: unknown record kinds are skipped
      }
    }
    rows.toSeq.map { case (f, n) =>
      FileStats(f, n, cols.getOrElse(f, Vector.empty).toMap)
    }
  }

  /** Write the manifest for a generation's data dir (call BEFORE the
    * commit marker: a crashed writer leaves the manifest as invisible
    * as the data).
    */
  def writeManifest(spark: SparkSession, dataDir: String, manifestPath: String): Int = {
    val stats = harvest(spark, dataDir)
    val fs = new Path(manifestPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(manifestPath), true)
    try out.write(renderManifest(stats).getBytes(UTF_8)) finally out.close()
    stats.size
  }

  def readManifest(spark: SparkSession, manifestPath: String): Option[Seq[FileStats]] = {
    val fs = new Path(manifestPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(manifestPath))) None
    else {
      val in = fs.open(new Path(manifestPath))
      val text = try new String(in.readAllBytes(), UTF_8) finally in.close()
      Some(parseManifest(text))
    }
  }
}
