package graft

import java.nio.file.Files
import graft.sources.{Ingest, Readers}

class SourcesSpec extends SparkSpecBase {

  private def tmp(suffix: String, content: String): String = {
    val f = Files.createTempFile("graft", suffix)
    Files.writeString(f, content)
    f.toString
  }

  test("csv reader honors header, delimiter, quoted fields") {
    val p = tmp(".csv", "gene,score\n\"TP53, human\",0.9\nBRCA1,0.5\n")
    val df = Readers.csv(spark, p)
    assert(df.columns.toSeq == Seq("gene", "score"))
    assert(df.count() == 2)
    assert(df.filter(df("gene") === "TP53, human").count() == 1)
  }

  test("tsv reader parses tab-delimited (read.delim equivalent)") {
    val p = tmp(".tsv", "symbol\thgnc_id\nTP53\tHGNC:11998\n")
    val df = Readers.tsv(spark, p)
    assert(df.columns.toSeq == Seq("symbol", "hgnc_id"))
    assert(df.first().getString(1) == "HGNC:11998")
  }

  test("csvSkipLines drops the OMIM-style preamble before parsing") {
    val p = tmp(".txt",
      "# Generated 2025-01-01\n# OMIM preamble\n# line three\n" +
        "gene\tmim\nTP53\t191170\nBRCA1\t113705\n")
    val df = Readers.csvSkipLines(spark, p, skipLines = 3, delimiter = "\t")
    assert(df.columns.toSeq == Seq("gene", "mim"))
    assert(df.count() == 2)
    assert(df.filter(df("gene") === "TP53").first().getInt(1) == 191170)
  }

  test("gzip csv reads transparently (reference pulls .csv.gz feeds)") {
    val dir = Files.createTempDirectory("graftgz")
    val p = dir.resolve("genes.csv.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(p))
    out.write("gene,score\nTP53,0.9\nBRCA1,0.5\n".getBytes("UTF-8"))
    out.close()
    val df = Readers.csv(spark, p.toString)
    assert(df.count() == 2 && df.columns.toSeq == Seq("gene", "score"))
  }

  test("json reader parses nested records") {
    val p = tmp(".json", """{"gene":"TP53","panel":{"id":1,"name":"x"}}""" + "\n")
    val df = Readers.json(spark, p)
    assert(df.select("panel.id").first().getLong(0) == 1L)
  }

  test("partitioned write round-trips with partition pruning") {
    val out = Files.createTempDirectory("graftpart").toString
    val src = Tables.orders(spark, sf)
    Readers.writePartitioned(src, out, Seq("o_orderstatus"))
    val back = Readers.parquet(spark, out)
    assert(back.count() == src.count())
    val pruned = back.filter(back("o_orderstatus") === "F")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), "expected partition pruning")
  }

  test("parquet schema evolution: mergeSchema unions generations, old rows null-extend") {
    import spark.implicits._
    // a lake table whose later ingest generations grew a column — the
    // re-import cycles' normal life; readers must see the union schema
    // with old generations null-extended, not a failure
    val dir = Files.createTempDirectory("graftevolve").toString
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/gen=1")
    Seq((2L, "y", 3.5)).toDF("id", "a", "b").write.parquet(s"$dir/gen=2")
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.toSet == Set("id", "a", "b", "gen"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("b")), "old generation must null-extend")
    assert(rows(1).getDouble(rows(1).fieldIndex("b")) == 3.5)
    assert(df.count() == 2)
  }

  test("orc round-trips with pushdown") {
    val out = Files.createTempDirectory("graftorc").toString + "/t"
    val src = Tables.customer(spark, sf)
    Readers.writeOrc(src, out)
    val back = Readers.orc(spark, out)
    assert(back.count() == src.count())
    val plan = back.filter(back("c_custkey") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,1)]"))
  }

  test("compacted write emits exactly one file per partition value") {
    val out = Files.createTempDirectory("graftcompact").toString + "/t"
    Readers.writeCompacted(Tables.orders(spark, sf), out, Seq("o_orderstatus"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName} has ${files.length} files")
    }
    assert(Readers.parquet(spark, out).count() == Tables.orders(spark, sf).count())
  }

  test("xlsx round-trips with inferred long/double/bool/string types") {
    val p = Files.createTempDirectory("graftxlsx").resolve("supp.xlsx").toString
    graft.sources.XlsxReader.write(p,
      header = Seq("gene", "mim_id", "score", "essential", "note"),
      rows = Seq(
        Seq("TP53", 191170L, 0.93, true, "guardian of the genome"),
        Seq("BRCA1", 113705L, 0.51, false, null),
        Seq("KRAS", 190070L, 0.77, true, "GTPase")))
    val df = graft.sources.XlsxReader.read(spark, p)
    assert(df.columns.toSeq == Seq("gene", "mim_id", "score", "essential", "note"))
    assert(df.schema.map(_.dataType.typeName) ==
      Seq("string", "long", "double", "boolean", "string"))
    assert(df.count() == 3)
    val tp53 = df.filter(df("gene") === "TP53").first()
    assert(tp53.getLong(1) == 191170L && tp53.getDouble(2) == 0.93 && tp53.getBoolean(3))
    assert(df.filter(df("note").isNull).count() == 1)
  }

  test("xlsx reader handles sparse rows and missing trailing cells") {
    val p = Files.createTempDirectory("graftxlsx2").resolve("sparse.xlsx").toString
    graft.sources.XlsxReader.write(p,
      header = Seq("a", "b", "c"),
      rows = Seq(Seq(1L, null, "x"), Seq(2L, 5L, null)))
    val df = graft.sources.XlsxReader.read(spark, p)
    assert(df.count() == 2)
    assert(df.filter(df("b").isNull).count() == 1)
    assert(df.filter(df("c").isNull).count() == 1)
  }

  test("xlsx reads through the DataSource V2 surface: spark.read.format(\"xlsx\")") {
    val p = Files.createTempDirectory("graftxlsxv2").resolve("supp.xlsx").toString
    graft.sources.XlsxReader.write(p,
      header = Seq("gene", "mim_id", "score"),
      rows = Seq(Seq("TP53", 191170L, 0.93), Seq("BRCA1", 113705L, 0.51)))
    val df = spark.read.format("xlsx").load(p)
    assert(df.columns.toSeq == Seq("gene", "mim_id", "score"))
    assert(df.schema.map(_.dataType.typeName) == Seq("string", "long", "double"))
    // results identical to the direct reader, and filters/projection compose
    assert(df.orderBy("gene").collect().toSeq ==
      graft.sources.XlsxReader.read(spark, p).orderBy("gene").collect().toSeq)
    assert(df.filter(df("score") > 0.9).select("gene").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSeq == Seq("TP53"))
  }

  test("xlsx selects sheets by NAME with startRow (GISMO/SCoNeS manuscript shapes)") {
    // three named sheets, out-of-alphabetical order; target sheet has a
    // title row above the header, as in read.xlsx(sheet = 'Supplementary
    // Table 2', startRow = 2) — temp-import-all-manuscript-files.R:13,26
    val p = Files.createTempDirectory("graftxlsxnamed").resolve("media-2.xlsx").toString
    graft.sources.XlsxReader.writeWorkbook(p, Seq(
      ("Legend", Seq(Seq("about"), Seq("this file has 3 sheets"))),
      ("Supplementary Table 2", Seq(
        Seq("GISMO gene scores (title row — skipped by startRow=2)", null, null),
        Seq("gene", "gismo_rank", "score"),
        Seq("TP53", 1L, 0.99),
        Seq("BRCA1", 2L, 0.87))),
      ("Supplementary Table 3", Seq(Seq("other"), Seq("x")))))
    assert(graft.sources.XlsxReader.sheetNames(p) ==
      Vector("Legend", "Supplementary Table 2", "Supplementary Table 3"))
    val byName = graft.sources.XlsxReader.readSheet(
      spark, p, "Supplementary Table 2", startRow = 2)
    assert(byName.columns.toSeq == Seq("gene", "gismo_rank", "score"))
    assert(byName.schema.map(_.dataType.typeName) == Seq("string", "long", "double"))
    assert(byName.count() == 2)
    assert(byName.filter(byName("gene") === "TP53").first().getDouble(2) == 0.99)
    // numeric index still resolves through workbook order
    val byIndex = graft.sources.XlsxReader.read(spark, p, sheet = 2, startRow = 2)
    assert(byIndex.orderBy("gene").collect().toSeq ==
      byName.orderBy("gene").collect().toSeq)
    // unknown name errors with the available names listed
    val err = intercept[IllegalArgumentException](
      graft.sources.XlsxReader.readSheet(spark, p, "Nope"))
    assert(err.getMessage.contains("Supplementary Table 2"))
  }

  test("xlsx DSv2 surface honors sheet-name + startRow options") {
    val p = Files.createTempDirectory("graftxlsxv2named").resolve("supp.xlsx").toString
    graft.sources.XlsxReader.writeWorkbook(p, Seq(
      ("Cover", Seq(Seq("cover page"), Seq("ignore"))),
      ("SCoNeS", Seq(
        Seq("title spanning the first row", null),
        Seq("gene", "scones_score"),
        Seq("TP53", 0.91), Seq("KRAS", 0.42)))))
    val df = spark.read.format("xlsx")
      .option("sheet", "SCoNeS").option("startRow", 2).load(p)
    assert(df.columns.toSeq == Seq("gene", "scones_score"))
    assert(df.count() == 2)
    assert(df.orderBy("gene").collect().toSeq ==
      graft.sources.XlsxReader.readSheet(spark, p, "SCoNeS", startRow = 2)
        .orderBy("gene").collect().toSeq)
  }

  test("zip-wrapped tsv reads through the csv path (HPA normal_tissue.tsv.zip shape)") {
    val dir = Files.createTempDirectory("graftzip")
    val p = dir.resolve("normal_tissue.tsv.zip")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(p))
    zos.putNextEntry(new java.util.zip.ZipEntry("normal_tissue.tsv"))
    zos.write("gene\ttissue\tlevel\nTP53\tliver\t3\nBRCA1\tbreast\t2\n".getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    val df = Readers.zippedTsv(spark, p.toString)
    assert(df.columns.toSeq == Seq("gene", "tissue", "level"))
    assert(df.count() == 2)
    assert(df.filter(df("gene") === "TP53").first().getInt(2) == 3)
    // named-entry selection + missing-entry error
    assert(Readers.zippedTsv(spark, p.toString, entry = Some("normal_tissue.tsv")).count() == 2)
    val err = intercept[IllegalArgumentException](
      Readers.zippedTsv(spark, p.toString, entry = Some("missing.tsv")))
    assert(err.getMessage.contains("missing.tsv"))
  }

  test("ingest logs per-source failures without aborting the batch") {
    val ing = new Ingest()
      .source("good")(Tables.nation(spark, sf))
      .source("bad")(Readers.parquet(spark, "/nonexistent/path.parquet"))
    assert(ing.results.keySet == Set("good"))
    assert(ing.errorLog.keySet == Set("bad"))
  }

  test("avro round-trips lineitem with schema parity vs parquet") {
    import graft.sources.AvroIO
    val src = Tables.lineitem(spark, sf) // long/int/double/string/timestamp
    val dir = Files.createTempDirectory("graft-avro").toString
    AvroIO.write(src, dir)
    val back = graft.sources.Readers.avro(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)), "schema drift through avro")
    assert(back.count() == src.count())
    // exact value parity, every column incl. the timestamp
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("avro round-trips array columns (embeddings) and nulls") {
    import spark.implicits._
    import graft.sources.AvroIO
    val src = Seq(
      (1L, Option("a"), Seq(1.0f, 2.5f)),
      (2L, Option.empty[String], Seq.empty[Float]),
      (3L, Option("c"), Seq(-0.25f))).toDF("id", "name", "vec")
    val dir = Files.createTempDirectory("graft-avro-arr").toString
    AvroIO.write(src, dir)
    val back = graft.sources.Readers.avro(spark, dir)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    assert(back.filter(back("name").isNull).count() == 1)
  }

  test("avro scan splits files and prunes columns like the parquet scan") {
    import graft.sources.AvroIO
    val src = Tables.lineitem(spark, sf).repartition(1) // one biggish file
    val dir = Files.createTempDirectory("graft-avro-split").toString
    AvroIO.write(src, dir)
    // force multi-split reads of the single file
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      val pruned = graft.sources.Readers.avro(spark, dir)
        .select("l_orderkey", "l_quantity")
      assert(pruned.rdd.getNumPartitions > 1,
        "expected the single avro file to split into multiple partitions")
      // pruning pushed into the scan: readSchema shows 2 columns, as
      // the parquet scan's ReadSchema would
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("l_orderkey") && !plan.contains("l_returnflag"),
        s"column pruning not pushed into the avro scan:\n$plan")
      // split reads see every record exactly once
      val viaParquet = src.select("l_orderkey", "l_quantity")
      assert(pruned.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(pruned).isEmpty)
      // filters still evaluate correctly above the scan
      assert(pruned.filter(pruned("l_quantity") > 25).count() ==
        viaParquet.filter(viaParquet("l_quantity") > 25).count())
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("fixed-width reader slices, trims, and nulls short lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fw")
    val f = dir.resolve("data.txt")
    java.nio.file.Files.write(f, java.util.List.of(
      "AAPL  150.25 NASDAQ",
      "GOOG  2800.1 NASDAQ",
      "SHORT",                // line ends before the later columns
      "MSFT   310.0 NYSE  "))
    val df = graft.sources.Readers.fixedWidth(spark, f.toString,
      Seq(("symbol", 1, 6), ("price", 7, 7), ("exchange", 14, 6)))
    val rows = df.collect().map(r =>
      (r.getString(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(rows == Set(
      ("AAPL", Some("150.25"), Some("NASDAQ")),
      ("GOOG", Some("2800.1"), Some("NASDAQ")),
      ("SHORT", None, None),
      ("MSFT", Some("310.0"), Some("NYSE"))))
  }

  test("json quarantine routes corrupt lines with their raw text preserved") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-jq")
    val f = dir.resolve("data.jsonl")
    java.nio.file.Files.write(f, java.util.List.of(
      """{"id": 1, "name": "alpha"}""",
      """{"id": 2, "name": "beta"}""",
      """{"id": 3, "name": "broken""",     // truncated JSON
      """not json at all"""))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (clean, quarantine) =
      graft.sources.Readers.jsonWithQuarantine(spark, f.toString, schema)
    assert(clean.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(!clean.columns.contains("_corrupt"))
    val bad = quarantine.select("_corrupt").collect().map(_.getString(0)).toSet
    assert(bad == Set("""{"id": 3, "name": "broken""", "not json at all"),
      s"quarantine must keep the raw lines, got $bad")
  }

  test("xml reader: row tags, attributes, repeated and nested children, multi-file") {
    import graft.sources.XmlReader
    val dir = Files.createTempDirectory("graftxml")
    Files.writeString(dir.resolve("a.xml"),
      """<genes release="110">
        |  <gene id="g1" chr="17">
        |    <symbol>TP53</symbol>
        |    <synonym>p53</synonym>
        |    <synonym>LFS1</synonym>
        |    <xref><db>HGNC</db><acc>11998</acc></xref>
        |  </gene>
        |  <gene id="g2">
        |    <symbol>BRCA1</symbol>
        |  </gene>
        |</genes>""".stripMargin)
    Files.writeString(dir.resolve("b.xml"),
      """<genes><gene id="g3" chr="13"><symbol>BRCA2</symbol></gene></genes>""")
    val df = XmlReader.xml(spark, dir.toString, rowTag = "gene")
    // sniffed columns: first-seen order over the first file's rows
    assert(df.columns.toSeq == Seq("_id", "_chr", "symbol", "synonym", "xref"))
    assert(df.count() == 3)
    val g1 = df.filter(df("_id") === "g1").first()
    assert(g1.getAs[String]("symbol") == "TP53")
    assert(g1.getAs[String]("synonym") == "p53|LFS1", "repeated child joins with |")
    assert(g1.getAs[String]("xref") == "HGNC11998", "nested structure flattens to text")
    val g2 = df.filter(df("_id") === "g2").first()
    assert(g2.getAs[String]("_chr") == null && g2.getAs[String]("synonym") == null,
      "absent attributes/children are NULL")
    assert(df.filter(df("_id") === "g3").first().getAs[String]("_chr") == "13",
      "rows from the second file parse through the first file's sniffed schema")
    // explicit schema-on-read: caller-pinned columns, no sniff
    val pinned = XmlReader.xml(spark, dir.toString, "gene",
      columns = Some(Seq("_id", "symbol")))
    assert(pinned.columns.toSeq == Seq("_id", "symbol") && pinned.count() == 3)
  }

  test("warc reader: records, typed headers, binary payloads, multi-file tasks") {
    import graft.sources.WarcReader
    // payloads deliberately contain CRLFs, blank lines, and a fake
    // header line — the Content-Length framing must not re-parse them
    val p1 = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>\r\n\r\nWARC/1.0 looks like a record but is payload\r\n</html>"
      .getBytes("ISO-8859-1")
    val p2 = Array[Byte](0, 1, 2, -1, 127, 10, 13, 0) // binary with NULs/CRLF
    val recs1 = Seq(
      (Map("WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://example.org/a",
        "WARC-Date" -> "2024-01-01T00:00:00Z",
        "WARC-Record-ID" -> "<urn:uuid:1>",
        "Content-Type" -> "application/http; msgtype=response"), p1),
      (Map("WARC-Type" -> "warcinfo",
        "WARC-Record-ID" -> "<urn:uuid:2>"), Array.empty[Byte]))
    val recs2 = Seq(
      (Map("WARC-Type" -> "resource",
        "WARC-Target-URI" -> "http://example.org/b",
        "WARC-Record-ID" -> "<urn:uuid:3>"), p2))
    val dir = Files.createTempDirectory("graftwarc")
    Files.write(dir.resolve("seg-00001.warc"), WarcReader.render(recs1))
    Files.write(dir.resolve("seg-00002.warc"), WarcReader.render(recs2))
    val df = WarcReader.warc(spark, dir.toString).cache()
    assert(df.count() == 3)
    assert(df.schema.fieldNames.toSeq == Seq("warc_type", "target_uri",
      "warc_date", "record_id", "content_type", "content_length", "payload"))
    val byId = df.collect().map(r => r.getAs[String]("record_id") -> r).toMap
    val r1 = byId("<urn:uuid:1>")
    assert(r1.getAs[String]("warc_type") == "response")
    assert(r1.getAs[String]("target_uri") == "http://example.org/a")
    assert(r1.getAs[Long]("content_length") == p1.length.toLong)
    assert(java.util.Arrays.equals(r1.getAs[Array[Byte]]("payload"), p1),
      "payload bytes must survive framing verbatim")
    // missing optional headers → null, payload may be empty
    val r2 = byId("<urn:uuid:2>")
    assert(r2.getAs[String]("target_uri") == null &&
      r2.getAs[Long]("content_length") == 0L)
    // binary payload from the second file/task intact
    assert(java.util.Arrays.equals(
      byId("<urn:uuid:3>").getAs[Array[Byte]]("payload"), p2))
    // per-file framing: records from both segment files arrive intact
    // (binaryFiles may COALESCE small files into one partition — the
    // per-file task split shows up only at real segment sizes, so the
    // parallelism contract here is "no record lost across files")
    assert(df.select("record_id").distinct().count() == 3)
    df.unpersist()
  }
}
