package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** SURVEY.md §2.2 — the reference's ingest surface re-expressed as
  * Spark sources. The reference pulls CSV/TSV (`read.delim`, `fread`
  * with skip-lines), JSON (`fromJSON`), and parquet (`arrow`) —
  * reference/scripts/import/temp-import-all-api-ftp.R:30,87-99,225-246.
  *
  * All readers return lazily-planned DataFrames; at 100 TB these scale
  * by file-splitting (spark.sql.files.maxPartitionBytes governs split
  * size) with column pruning/pushdown where the format supports it.
  */
object Readers {

  def parquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** `read.delim` / `fread` equivalent. */
  def csv(s: SparkSession, path: String, delimiter: String = ",",
          header: Boolean = true, schema: Option[StructType] = None): DataFrame = {
    val r = s.read
      .option("delimiter", delimiter)
      .option("header", header)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
    schema.fold(r.option("inferSchema", true))(sc => r.schema(sc)).csv(path)
  }

  def tsv(s: SparkSession, path: String, header: Boolean = true,
          schema: Option[StructType] = None): DataFrame =
    csv(s, path, delimiter = "\t", header = header, schema = schema)

  /** `read.delim(skip = n)` (OMIM preamble lines,
    * import-api-ftp.R:150-155): drop the first n physical lines of ONE
    * file, then parse the rest as CSV with the same quote/escape/mode
    * options as [[csv]]. Single-file by contract — the reference
    * semantics are per-file, and a glob/directory input would skip n
    * lines of the concatenated partition order instead (only the
    * first file's preamble). For marked preambles prefer
    * `option("comment", "#")`, which IS per-file and glob-safe.
    */
  def csvSkipLines(s: SparkSession, path: String, skipLines: Int,
                   delimiter: String = ",", header: Boolean = true): DataFrame = {
    import org.apache.spark.sql.Encoders
    require(!path.exists("*?[{".contains(_)) &&
      !java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path)),
      s"csvSkipLines is single-file by contract (per-file skip semantics): $path")
    // line order within one text file is deterministic (Hadoop line
    // records), so zipWithIndex is a safe distributed skip
    val lines = s.sparkContext.textFile(path)
      .zipWithIndex().filter(_._2 >= skipLines).map(_._1)
    val ds = s.createDataset(lines)(Encoders.STRING)
    s.read
      .option("delimiter", delimiter)
      .option("header", header)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("inferSchema", true)
      .csv(ds)
  }

  /** Zip-wrapped delimited text — `readr::read_tsv("….tsv.zip")`
    * (reference temp-import-all-web-files.R:22-23, the HPA
    * normal_tissue.tsv.zip pull). Spark reads .gz transparently but
    * not .zip, so the named (or first non-directory) entry is
    * decompressed through a JDK ZipInputStream and fed to the same
    * csv options as [[csv]].
    *
    * Single-file dimension contract, like xlsx: a zip is one
    * non-splittable stream, so the entry is inflated ON THE DRIVER
    * and parallelized — the right shape for the reference's
    * dimension-table pulls. Bulk data belongs in parquet/ORC/gzip
    * text, which split or at least stream executor-side.
    */
  def zippedCsv(s: SparkSession, path: String, delimiter: String = ",",
                header: Boolean = true, schema: Option[StructType] = None,
                entry: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.Encoders
    val zf = new java.util.zip.ZipFile(path)
    val lines = try {
      import scala.jdk.CollectionConverters._
      val e = entry match {
        case Some(name) => Option(zf.getEntry(name)).getOrElse(
          throw new IllegalArgumentException(s"$path has no zip entry '$name'"))
        case None => zf.entries().asScala.find(!_.isDirectory).getOrElse(
          throw new IllegalArgumentException(s"$path contains no file entries"))
      }
      val rd = new java.io.BufferedReader(new java.io.InputStreamReader(
        zf.getInputStream(e), java.nio.charset.StandardCharsets.UTF_8))
      Iterator.continually(rd.readLine()).takeWhile(_ != null).toVector
    } finally zf.close()
    val ds = s.createDataset(lines)(Encoders.STRING)
    val r = s.read
      .option("delimiter", delimiter)
      .option("header", header)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
    schema.fold(r.option("inferSchema", true))(sc => r.schema(sc)).csv(ds)
  }

  /** `read_tsv("….tsv.zip")` shape (HPA normal-tissue table). */
  def zippedTsv(s: SparkSession, path: String, header: Boolean = true,
                schema: Option[StructType] = None,
                entry: Option[String] = None): DataFrame =
    zippedCsv(s, path, delimiter = "\t", header = header, schema = schema, entry = entry)

  /** JSON lines (and, via multiLine, whole-document JSON like the
    * PanelApp API pages). */
  def json(s: SparkSession, path: String, multiLine: Boolean = false,
           schema: Option[StructType] = None): DataFrame = {
    val r = s.read.option("multiLine", multiLine)
    schema.fold(r)(sc => r.schema(sc)).json(path)
  }

  /** JSON lines with CORRUPT-RECORD ROUTING: parse in PERMISSIVE mode
    * against an explicit schema, then split the frame into (clean,
    * quarantine) — the quarantine keeps the raw unparseable line in
    * `_corrupt` for a repair pass, the batch analogue of
    * QualityGate's streaming quarantine. The parsed frame is cached
    * before the corrupt column is referenced: Spark refuses a query
    * whose only referenced column from a raw JSON scan is the
    * internal corrupt-record column, and the cache also means the
    * file parses once for both routes. */
  def jsonWithQuarantine(s: SparkSession, path: String,
                         schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = schema.add("_corrupt", StringType, nullable = true)
    val parsed = s.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(withCorrupt).json(path)
      .cache()
    (parsed.filter(col("_corrupt").isNull).drop("_corrupt"),
      parsed.filter(col("_corrupt").isNotNull))
  }

  /** Fixed-width layout (the mainframe/legacy-export shape): each
    * column is a (name, 1-based start, length) slice of the line,
    * trimmed; short lines yield empty slices → NULL via nullif. One
    * narrow projection over spark.read.text — splittable, no UDF. */
  def fixedWidth(s: SparkSession, path: String,
                 cols: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, nullif, lit, trim, substring}
    require(cols.nonEmpty, "supply at least one (name, start, length) column")
    s.read.text(path).select(cols.map { case (name, start, len) =>
      nullif(trim(substring(col("value"), start, len)), lit("")).as(name)
    }: _*)
  }

  /** ORC round-trip — second columnar format with predicate pushdown,
    * for interop with warehouses that standardize on ORC. */
  def orc(s: SparkSession, path: String): DataFrame = s.read.orc(path)
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Avro round-trip — the mainstream ROW lake format, via the graft
    * DSv2 source ([[AvroDataSource]]; the spark-avro connector module
    * is not on this classpath). Spark's `useV1SourceList` default
    * includes "avro" and would force the name down the (absent) V1
    * path, so this helper removes it once per session — after which
    * plain `spark.read.format("avro")` works too. Removing it is safe
    * here by construction: with no V1 avro provider on the classpath
    * there is nothing the legacy list could route to.
    */
  def avro(s: SparkSession, path: String): DataFrame = {
    enableAvro(s)
    s.read.format("avro").load(path)
  }
  def writeAvro(df: DataFrame, path: String): Unit = AvroIO.write(df, path)
  def enableAvro(s: SparkSession): Unit = {
    val key = "spark.sql.sources.useV1SourceList"
    val cur = s.conf.get(key)
    val pruned = cur.split(",").map(_.trim).filter(v => v.nonEmpty && v != "avro")
    if (pruned.length != cur.split(",").length)
      s.conf.set(key, pruned.mkString(","))
  }

  /** Partitioned parquet sink — the scale-path layout (the reference
    * writes one flat parquet per table; at 100 TB you partition by a
    * stable, low-cardinality key).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Compacted partitioned write: repartition on the partition
    * columns first so each output partition holds one file per
    * shuffle partition instead of one per input task — the
    * small-files mitigation every large pipeline needs (a 100 TB
    * job with 10⁵ tasks × 10³ partition values otherwise emits 10⁸
    * files).
    */
  def writeCompacted(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
