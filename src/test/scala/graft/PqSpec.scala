package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pq, Similarity}

/** Round-8 product-quantization invariants: code shape/compression,
  * reconstruction sanity, ADC recall vs exact cosine top-k, and
  * determinism of the whole train→encode→query pipeline.
  */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  test("codebooks: m subspaces x ksub centroids of dim/m floats") {
    val books = Pq.trainCodebooks(emb, m = 16, ksub = 32, iters = 2)
    val shape = books.groupBy("sub").agg(count(lit(1)).as("n")).collect()
    assert(shape.length == 16)
    shape.foreach(r => assert(r.getLong(1) <= 32 && r.getLong(1) >= 2))
    assert(books.select(size(col("cemb"))).distinct().as[Int].collect().toSeq == Seq(4))
  }

  test("codes: every vector gets exactly m codes in [0, ksub)") {
    val books = Pq.trainCodebooks(emb)
    val codes = Pq.encode(emb, books)
    assert(codes.count() == emb.count())
    assert(codes.filter(size(col("codes")) =!= 16).count() == 0)
    val rng = codes.select(explode(col("codes")).as("c"))
      .agg(min("c"), max("c")).as[(Int, Int)].head()
    assert(rng._1 >= 0 && rng._2 < 32)
    // 16x compression: 64 floats (256 B) -> 16 byte-range codes
    assert(256.0 / 16.0 == 16.0)
  }

  test("ADC recall vs exact cosine top-k clears the ANN bar") {
    val books = Pq.trainCodebooks(emb)
    val codes = Pq.encode(emb, books)
    val queries = emb.filter(col("vec_id") < 5)
    // PQ approximates L2; on these unnormalized synthetic vectors we
    // compare against exact EUCLIDEAN top-k (the metric PQ encodes)
    val a = emb.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .filter(col("query_id") < 5)
    val b = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val exact = broadcast(a).join(b, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(zip_with(col("qe"), col("ne"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v).as("d2"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("d2").asc, col("neighbor_id").asc)))
      .filter(col("rnk") <= 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Pq.adcTopK(codes, books, queries, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(approx.nonEmpty)
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.45, s"PQ/ADC recall $recall below the 0.45 bar")
  }

  test("IVF-PQ prunes the candidate set and still clears a recall bar") {
    val queries = emb.filter(col("vec_id") < 5)
    val full = Pq.adcTopK(Pq.encode(emb, Pq.trainCodebooks(emb)),
        Pq.trainCodebooks(emb), queries, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = Pq.ivfPqTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivfpq.nonEmpty)
    // cell probing can only SHRINK the candidate set vs full ADC: at
    // nProbe=6 of 16 cells each query scans ~3/8 of the corpus, so
    // the IVF-PQ result must stay close to full-ADC (which itself
    // clears 0.45 vs exact)
    val agree = (ivfpq intersect full).size.toDouble / full.size
    assert(agree >= 0.5, s"IVF-PQ diverged from full ADC: $agree")
  }

  test("train -> encode -> query is deterministic end to end") {
    def run(): Seq[String] = {
      val books = Pq.trainCodebooks(emb)
      val codes = Pq.encode(emb, books)
      Pq.adcTopK(codes, books, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rnk"))
        .collect().map(_.toString).sorted.toSeq
    }
    assert(run() == run())
  }

  test("queryLuts rows are dense by cid: dropped centroids pad with +inf") {
    // Lloyd's means update drops centroids with zero assignments, so
    // cids can be non-contiguous; the ADC kernel indexes LUT rows
    // positionally by code (= cid). A books table missing cid 1 must
    // still produce a cid-addressable row: [d(c0), +inf, d(c2)].
    val books = Seq((0, 0, Seq(0f, 0f)), (0, 2, Seq(1f, 1f)))
      .toDF("sub", "cid", "cemb")
    val q = Seq((100L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val luts = Pq.queryLuts(books, q, m = 1)
      .select("luts").as[Seq[Seq[Double]]].head()
    assert(luts.length == 1)
    val row = luts.head
    assert(row.length == 3, s"row must span cids 0..2, got $row")
    assert(row(1).isPosInfinity, s"dropped cid 1 must pad +inf: $row")
    assert(math.abs(row(0) - 0.5) < 1e-6 && math.abs(row(2) - 0.5) < 1e-6)
    // and the kernel reads the padded row correctly for a code on the
    // far side of the gap
    val codes = Seq((200L, Seq(2))).toDF("vec_id", "codes")
    val d = codes.crossJoin(Pq.queryLuts(books, q, m = 1))
      .select(graft.functions.GraftFunctions.adcDistance(col("codes"), col("luts")))
      .as[Double].head()
    assert(math.abs(d - 0.5) < 1e-6)
  }

  test("sparse non-0-based vec_ids still seed full codebooks and cells") {
    // rank-based seeding: `vec_id < ksub` would find ZERO seeds here
    val sparse = emb.select((col("vec_id") * 7 + 1000).as("vec_id"), col("embedding"))
    val books = Pq.trainCodebooks(sparse, m = 16, ksub = 32, iters = 1)
    val shape = books.groupBy("sub").agg(count(lit(1)).as("n")).collect()
    assert(shape.length == 16)
    shape.foreach(r => assert(r.getLong(1) >= 2 && r.getLong(1) <= 32))
    val cents = Similarity.ivfTrain(sparse, nCentroids = 8, iters = 1)
    val n = cents.count()
    assert(n >= 1 && n <= 8, s"IVF must seed from sparse ids, got $n cells")
  }

  test("persisted serving index: fresh-read probe matches in-session IVF-PQ") {
    // train once, write (books, cents, codes-by-cell), then answer the
    // same queries from the parquet layout with no reference to any
    // in-memory training frame — the retrieval-service shape. Training
    // is deterministic, so served results must be IDENTICAL.
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-index").toString
    Pq.writeIndex(emb, dir)
    val queries = emb.filter(col("vec_id") < 5)
    val served = Pq.probeIndex(spark, dir, queries, k = 10)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    val inSession = Pq.ivfPqTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(served == inSession,
      s"served index diverged from in-session: ${(served diff inSession).take(5)}")

    // plan shape: the corpus (codes) side must stay NARROW — scan,
    // broadcast probe join, broadcast LUT join, codegen ADC — all the
    // way into TopKPerKeyExec, whose k-bounded partial-heap shuffle is
    // the ONLY corpus-wide data movement (it is an internal RDD
    // shuffle, not a ShuffleExchangeExec). So: zero SQL exchanges may
    // contain the codes scan; the remaining exchanges sit on the
    // nq-row query side (probe window, LUT rollup), bounded by the
    // request, not the corpus.
    val sp = Pq.probeIndex(spark, dir, queries, k = 10)
      .queryExecution.sparkPlan
    assert(sp.collect { case t: graft.plans.TopKPerKeyExec => t }.nonEmpty,
      "probe top-k must ride TopKPerKeyExec")
    val exchanges = sp.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val corpusSide = exchanges.count(e =>
      e.collectLeaves().exists(_.toString.contains("/codes")))
    assert(corpusSide == 0,
      s"codes-scan side must reach the top-k with no SQL exchange, got $corpusSide")
    assert(exchanges.size <= 4, s"probe plan grew: ${exchanges.size} exchanges")
  }

  test("appendToIndex: frozen-quantizer append equals a frozen-books full rebuild") {
    // service write path: build the index on an initial corpus, then
    // append a held-out batch WITHOUT retraining. Probing the appended
    // index must equal probing an index whose codes were built over
    // the FULL corpus with the SAME frozen books/cents (training on
    // the initial corpus is part of the contract — the quantizer does
    // not move on ingest).
    val initial = emb.filter(col("vec_id") < 400)
    val late = emb.filter(col("vec_id") >= 400)
    assert(late.count() > 0, "need a held-out batch")

    val dirA = java.nio.file.Files.createTempDirectory("graft-pq-app").toString
    Pq.writeIndex(initial, dirA)
    Pq.appendToIndex(spark, dirA, late)

    // reference: identical layout, codes built in one pass over the
    // full corpus with dirA's frozen books/cents
    val dirB = java.nio.file.Files.createTempDirectory("graft-pq-ref").toString
    val books = spark.read.parquet(s"$dirA/books")
    val cents = spark.read.parquet(s"$dirA/cents")
    books.write.parquet(s"$dirB/books")
    cents.write.parquet(s"$dirB/cents")
    val cellOf = Similarity.ivfAssign(cents, emb)
      .select(col("vec_id"), col("cid"))
    Pq.encode(emb, books).join(cellOf, "vec_id")
      .write.partitionBy("cid").parquet(s"$dirB/codes")

    val queries = emb.filter(col("vec_id") < 5)
    def probe(dir: String) = Pq.probeIndex(spark, dir, queries, k = 10)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet
    assert(probe(dirA) == probe(dirB),
      "append path diverged from the frozen-books rebuild")

    // an appended vector is actually servable: its own embedding as a
    // query must return it as the nearest neighbor
    val lateId = late.select(min(col("vec_id"))).as[Long].head()
    val lateQ = emb.filter(col("vec_id") === lateId)
    val top = Pq.probeIndex(spark, dirA, lateQ, k = 3)
      .filter(col("rnk") === 1).select("neighbor_id").as[Long].collect()
    // rnk-1 may be a true near-duplicate, but the appended id must be
    // in the served set at all
    val servedIds = Pq.probeIndex(spark, dirA, lateQ, k = 10)
      .select("neighbor_id").as[Long].collect().toSet
    assert(top.nonEmpty)
    assert(servedIds.exists(id => id >= 400),
      "appended vectors must be reachable from the probe path")
  }

  test("compactIndex folds append-accumulated files to one per cell, probe unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-cmp").toString
    Pq.writeIndex(emb.filter(col("vec_id") < 300), dir)
    Pq.appendToIndex(spark, dir, emb.filter(col("vec_id") >= 300 && col("vec_id") < 400))
    Pq.appendToIndex(spark, dir, emb.filter(col("vec_id") >= 400))

    def filesPerCell(): Map[String, Int] = {
      val root = new java.io.File(s"$dir/codes")
      root.listFiles().filter(_.getName.startsWith("cid=")).map { d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    }
    val queries = emb.filter(col("vec_id") < 5)
    def probe() = Pq.probeIndex(spark, dir, queries, k = 10)
      .select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect().toSet

    val before = probe()
    assert(filesPerCell().values.exists(_ > 1),
      "appends should have accumulated multiple files in some cell")
    Pq.compactIndex(spark, dir)
    val after = filesPerCell()
    assert(after.nonEmpty && after.values.forall(_ == 1),
      s"every cell must compact to one file, got $after")
    assert(probe() == before, "compaction must not change served answers")
  }

  test("drift advisory: keeps on the training distribution, rebuilds on a planted shift") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-drift").toString
    Pq.writeIndex(emb, s"$dir/index", m = 8, ksub = 16, nCentroids = 8)
    // the training corpus re-presented: occupancy identical, sim
    // identical → PSI ≈ 0 (smoothing only), zero sim drop, keep
    val inDist = Pq.rebuildAdvisory(spark, s"$dir/index", emb)
    val inRows = inDist.collect()
    assert(inRows.nonEmpty)
    assert(inRows.forall(_.getAs[String]("verdict") == "keep"),
      s"in-distribution batch advised rebuild: psi=${inRows.head.getAs[Double]("psi_total")}")
    assert(math.abs(inRows.head.getAs[Double]("psi_total")) < 0.01)
    assert(math.abs(inRows.head.getAs[Double]("sim_drop")) < 1e-6)
    // planted covariate shift: reversed embeddings scatter across
    // cells and sit farther from every frozen centroid → rebuild
    val drifted = Pq.rebuildAdvisory(spark, s"$dir/index",
      emb.select(col("vec_id"), reverse(col("embedding")).as("embedding")))
    val dRows = drifted.collect()
    assert(dRows.forall(_.getAs[String]("verdict") == "rebuild"),
      s"planted shift not flagged: psi=${dRows.head.getAs[Double]("psi_total")} " +
        s"sim_drop=${dRows.head.getAs[Double]("sim_drop")}")
    // conservation: the global psi is exactly the per-cell sum (up to
    // the round(,6) each side carries), and smoothed shares sum to 1
    Seq(inRows, dRows).foreach { rows =>
      val termSum = rows.map(_.getAs[Double]("psi_term")).sum
      assert(math.abs(termSum - rows.head.getAs[Double]("psi_total")) < 1e-4)
      assert(math.abs(rows.map(_.getAs[Double]("share_train")).sum - 1.0) < 1e-3)
      assert(math.abs(rows.map(_.getAs[Double]("share_recent")).sum - 1.0) < 1e-3)
    }
    // partition invariance: the advisory is exact aggregates over a
    // bounded domain — a 13-way repartition of the batch is bit-equal
    val repart = Pq.rebuildAdvisory(spark, s"$dir/index", emb.repartition(13))
    assert(repart.exceptAll(inDist).isEmpty && inDist.exceptAll(repart).isEmpty)
  }

  test("q188 driver query: one frame, both scenarios, opposite verdicts") {
    val rows = SparkEntry.queries("q188_index_drift")(spark, sf).collect()
    val byScenario = rows.groupBy(_.getAs[String]("scenario"))
    assert(byScenario.keySet == Set("in_dist", "drifted"))
    assert(byScenario("in_dist").forall(_.getAs[String]("verdict") == "keep"))
    assert(byScenario("drifted").forall(_.getAs[String]("verdict") == "rebuild"))
  }

  test("q152 driver query returns k rows per query with contiguous ranks") {
    val out = SparkEntry.queries("q152_pq_ann")(spark, sf)
    val per = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rnk").as("mx"))
      .as[(Long, Long, Int)].collect()
    assert(per.length == 5)
    per.foreach { case (_, n, mx) => assert(n == 10 && mx == 10) }
  }
}
