package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{BloomFunctions, BloomOps}

/** Per-file BLOOM POINT-INDEX sidecar (`_BLOOM.tsv`) — the second
  * data-skipping tier next to the min/max stats manifest
  * (SURVEY §2.5 #51c; the Delta Bloom-filter-index / Iceberg Puffin
  * capability). Min/max prunes RANGE predicates and bites only when
  * the layout clusters the column (z-order); a point lookup on a
  * high-cardinality UNclustered column (find ONE order key, ONE doc
  * id, ONE url hash across a 100 TB table) matches every file's
  * [min,max] and prunes nothing. A per-file Bloom of the column's
  * values answers "can this file contain v?" in 8 KiB per file per
  * column — false positives open a file needlessly (bounded rate),
  * false negatives are impossible, so pruning stays provably
  * lossless.
  *
  * Unlike the footer-harvested stats manifest, building value filters
  * requires ONE distributed pass over the data — the documented
  * publish-time cost (`input_file_name()` groupBy, one mergeable
  * [[graft.functions.BloomAggregate]] per indexed column, result is
  * files×columns rows of fixed-size bytes). Values fold as their
  * CANONICAL STRING render; integral and string columns only —
  * doubles have no stable cross-type render and stay stats-pruned.
  */
object BloomIndex {

  val NumBits: Int = 1 << 16 // 8 KiB of filter per (file, column)
  val NumHashes: Int = 5

  /** Canonical probe/build render. None ⇒ the type is not indexable
    * (doubles, nulls) and the file must be kept. */
  def renderValue(v: Any): Option[String] = v match {
    case null => None
    case _: Double | _: Float => None
    case s: String => Some(s)
    case n @ (_: Long | _: Int | _: Short | _: Byte) => Some(n.toString)
    case other => Some(other.toString)
  }

  /** ONE distributed scan: per file, one Bloom per indexed column.
    * The frame is files-count-sized (same bounded class the stats
    * manifest collects). */
  def write(spark: SparkSession, dataDir: String, columns: Seq[String],
            indexPath: String): Int = {
    require(columns.nonEmpty, "no columns to index")
    val df = spark.read.parquet(dataDir)
    columns.foreach { c =>
      val dt = df.schema(c).dataType.typeName
      require(!Set("double", "float").contains(dt),
        s"bloom index on floating column '$c' has no stable value render")
    }
    val aggs = columns.map(c => BloomFunctions.bloomAgg(
      col(c).cast("string"), NumBits, NumHashes).as(s"__b_$c"))
    val perFile = df
      .select(input_file_name().as("__f") +: columns.map(col): _*)
      .groupBy(col("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // files × columns rows of fixed-size bytes — bounded
    val sb = new StringBuilder
    perFile.foreach { r =>
      // input_file_name() renders "file:///…" (URI form); the stats
      // manifest keys by Hadoop Path.toString ("file:/…") — normalize
      // through Path so the two sidecars join on identical names
      val file = new Path(new java.net.URI(r.getAs[String]("__f"))).toString
      columns.foreach { c =>
        val bits = r.getAs[Array[Byte]](s"__b_$c")
        sb.append("B\t").append(file).append('\t').append(c).append('\t')
          .append(NumBits).append('\t').append(NumHashes).append('\t')
          .append(Base64.getEncoder.encodeToString(bits)).append('\n')
      }
    }
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(indexPath), true)
    try out.write(sb.toString.getBytes(UTF_8)) finally out.close()
    perFile.length
  }

  /** (file, column) → (bits, numHashes); None if no sidecar exists. */
  def read(spark: SparkSession,
           indexPath: String): Option[Map[(String, String), (Array[Byte], Int)]] = {
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(indexPath))) None
    else {
      val in = fs.open(new Path(indexPath))
      val text = try new String(in.readAllBytes(), UTF_8) finally in.close()
      val m = text.linesIterator.filter(_.nonEmpty).flatMap { line =>
        val p = line.split('\t')
        // forward-compatible: unknown record kinds are skipped
        if (p(0) != "B") None
        else Some((p(1), p(2)) -> (Base64.getDecoder.decode(p(5)), p(4).toInt))
      }.toMap
      Some(m)
    }
  }

  /** Sound may-contain: true unless an index entry for (file, column)
    * exists AND the filter rules the rendered value out. */
  def mayContain(idx: Map[(String, String), (Array[Byte], Int)],
                 file: String, column: String, value: Any): Boolean =
    renderValue(value) match {
      case None => true
      case Some(s) => idx.get((file, column)) match {
        case None => true // column not indexed (or legacy generation)
        case Some((bits, k)) =>
          BloomOps.mightContain(bits, UTF8String.fromString(s), k)
      }
    }
}
