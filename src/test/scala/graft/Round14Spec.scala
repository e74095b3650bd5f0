package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.queries.{CurationQueries, GraphQueries, TextQueries}

/** Invariants for the round-14 operators. Every oracled query here is
  * also hash-checked against DuckDB; these cases pin the SEMANTIC
  * properties a hash can't name.
  */
class Round14Spec extends SparkSpecBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("q243: integer HITS path-count identities, zeroed sources/sinks, norms in [0,1]") {
    val r = GraphQueries.queries("q243_hits")(spark, sf01).collect()
    assert(r.nonEmpty)
    // recompute the round-1 identity independently: after h0 == 1,
    // auth-after-one-round(v) = indegree(v); the returned auth is
    // round TWO, so check instead auth > 0 <=> node has an in-edge
    // and hub > 0 <=> node has an out-edge.
    val edges = Tables.orders(spark, sf01)
      .select((col("o_custkey") % 200).as("src"), (col("o_orderkey") % 200).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().collect()
    val hasIn = edges.map(_.getAs[Long]("dst")).toSet
    val hasOut = edges.map(_.getAs[Long]("src")).toSet
    r.foreach { row =>
      val id = row.getAs[Long]("id")
      val auth = row.getAs[Long]("auth"); val hub = row.getAs[Long]("hub")
      assert((auth > 0) == hasIn.contains(id), s"auth sign wrong for $id")
      assert((hub > 0) == hasOut.contains(id), s"hub sign wrong for $id")
      val an = row.getAs[Double]("auth_norm"); val hn = row.getAs[Double]("hub_norm")
      assert(an >= 0.0 && an <= 1.0 && hn >= 0.0 && hn <= 1.0)
    }
    assert(r.exists(_.getAs[Double]("auth_norm") == 1.0), "no max-auth node at 1.0")
    assert(r.exists(_.getAs[Double]("hub_norm") == 1.0), "no max-hub node at 1.0")
  }

  test("jaro-winkler kernel: textbook values incl. boost-threshold and floor-transposition edges") {
    import graft.functions.StringOps.jaroWinkler
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def jw(a: String, b: String) = jaroWinkler(u(a), u(b))
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    // boost threshold: jaro 0.5 with a 2-char common prefix stays 0.5
    assert(jw("abcdefgh", "abzzzzzz") == 0.5)
    // DuckDB empty conventions
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    // floor-transposition convention (the round-14 parity fix):
    // this pair has 3 mismatched matched-positions -> t = 1, not 1.5
    assert(math.abs(jw("Customer#00000150", "Customer#000000015")
      - 0.9771241830065359) < 1e-15)
    // non-ASCII parity (the round-15 fix): DuckDB scores UTF-8 BYTE
    // strings, so 'münchen' is length 8 (ü = 2 bytes) ->
    // ((6/8 + 6/7 + 1)/3) boosted by the 1-byte 'm' prefix. All five
    // expected values read straight out of duckdb
    // jaro_winkler_similarity on these literals.
    assert(math.abs(jw("münchen", "munchen") - 0.8821428571428571) < 1e-15)
    assert(math.abs(jw("日本語処理", "日本語の処理") - 0.9666666666666667) < 1e-15)
    // astral-plane (surrogate pair in UTF-16, 4 bytes in UTF-8)
    assert(math.abs(jw("😀abc", "a😀bc") - 0.9047619047619048) < 1e-15)
    assert(math.abs(jw("𝔘nicode", "Unicode") - 0.8190476190476191) < 1e-15)
    assert(math.abs(jw("😀😀", "😀") - 0.9) < 1e-15)
  }

  test("q245: matcher finds the true record for a solid majority of dirty records") {
    val r = graft.queries.AnalyticQueries.queries("q245_jw_linkage")(spark, sf01).collect()
    assert(r.nonEmpty)
    val acc = r.count(_.getAs[Int]("is_correct") == 1).toDouble / r.length
    assert(acc >= 0.5, s"linkage accuracy collapsed: $acc")
    r.foreach { row =>
      val jw = row.getAs[Double]("jw_best")
      assert(jw > 0.8 && jw <= 1.0, s"implausible best score: $row")
    }
  }

  test("soundex kernel: classic codes, h/w transparency, vowel separation") {
    import graft.functions.StringOps.soundex
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def sx(w: String) = soundex(u(w)).toString
    assert(sx("smith") == "S530" && sx("smyth") == "S530")
    assert(sx("robert") == "R163" && sx("rupert") == "R163")
    assert(sx("ashcraft") == "A261") // h-transparency: s,c collapse across h
    assert(sx("tymczak") == "T522")
    assert(sx("pfister") == "P236") // first-letter code run absorbs f
    assert(sx("honeyman") == "H555")
    assert(sx("red") == "R300" && sx("rod") == "R300")
    assert(sx("") == "" && sx("123") == "")
  }

  test("q246: planted phonetic pairs collide; every group is a true collision") {
    val r = graft.queries.AnalyticQueries.queries("q246_soundex_block")(spark, sf01).collect()
    val byCode = r.map(row => row.getAs[String]("code") -> row.getAs[String]("words")).toMap
    assert(byCode.get("S530").exists(w => w.contains("smith") && w.contains("smyth")))
    assert(byCode.get("R163").exists(w => w.contains("robert") && w.contains("rupert")))
    r.foreach { row =>
      assert(row.getAs[Long]("n_words") >= 2)
      assert(row.getAs[String]("words").split(",").length ==
        row.getAs[Long]("n_words"))
    }
  }

  test("q247: planted exact duplicates recovered; every pair passes the threshold") {
    val r = graft.queries.TextQueries.queries("q247_setsim_join")(spark, sf01).collect()
    assert(r.nonEmpty)
    // plantedCorpus copies doc_id < 50 to id+1_000_000 with identical
    // text: every copied doc with >= 3 words must appear as a J=1 pair
    val exact = r.filter(row => row.getAs[Long]("b") == row.getAs[Long]("a") + 1000000)
    assert(exact.length >= 40, s"only ${exact.length} planted pairs recovered")
    exact.foreach(row => assert(row.getAs[Double]("jac") == 1.0))
    r.foreach { row =>
      assert(row.getAs[Long]("a") < row.getAs[Long]("b"))
      assert(row.getAs[Long]("n_inter") * 5 >= row.getAs[Long]("n_union") * 3)
      val j = row.getAs[Double]("jac")
      assert(j >= 0.6 && j <= 1.0)
    }
  }

  test("q248: survivorship rules recomputed first-principles on planted keys") {
    val r = graft.queries.OpsQueries.queries("q248_golden_record")(spark, sf01)
      .collect().map(row => row.getAs[Long]("k") -> row).toMap
    val cust = Tables.customer(spark, sf01)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .collect().map(row => row.getLong(0) -> row).toMap
    assert(r.size == cust.size)
    cust.foreach { case (k, c) =>
      val g = r(k)
      val name = c.getString(1); val seg = c.getString(3)
      val cents = BigDecimal(c.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      if (k % 8 == 0) {
        assert(g.getAs[String]("golden_name") == name.toUpperCase) // from sysB
        assert(g.getAs[String]("golden_seg") == seg) // sysC repeats the master seg
        assert(BigDecimal(g.getAs[Double]("golden_bal")).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) == cents - 5.25) // most recent = sysC
        assert(g.getAs[Long]("n_records") == 3L)
        assert(g.getAs[Int]("n_conflicts") == 2) // name + bal differ, seg doesn't
      } else if (k % 4 == 0) {
        assert(g.getAs[String]("golden_name") == name.toUpperCase)
        assert(g.getAs[Long]("n_records") == 2L)
      } else {
        assert(g.getAs[String]("golden_name") == name)
        assert(g.getAs[Long]("n_records") == 1L)
        assert(g.getAs[Int]("n_conflicts") == 0)
      }
    }
  }

  test("q249: rank-1 sentence is the doc's centrality max; ranks well-formed") {
    val r = TextQueries.queries("q249_textrank")(spark, sf01).collect()
    assert(r.nonEmpty)
    val byDoc = r.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("sent_rank")).sorted.sameElements(
        (1 to rows.length)))
      val sorted = rows.sortBy(_.getAs[Int]("sent_rank"))
      val head = sorted.head
      // rank 1 dominates rank 2 on (r2, r1, pos) lexicographically
      sorted.drop(1).foreach { o =>
        val cmp = (head.getAs[Long]("r2"), o.getAs[Long]("r2"))
        assert(cmp._1 > cmp._2 ||
          (cmp._1 == cmp._2 && head.getAs[Long]("r1") >= o.getAs[Long]("r1")))
      }
    }
  }

  test("q250: pairwise stylometric distances well-formed over the source grid") {
    val r = TextQueries.queries("q250_stylometry")(spark, sf01).collect()
    val srcs = Tables.documents(spark, sf01).select("source").distinct().count()
    assert(r.length == (srcs * (srcs - 1) / 2).toInt, "not all a<b source pairs present")
    r.foreach { row =>
      assert(row.getAs[String]("src_a") < row.getAs[String]("src_b"))
      val d = row.getAs[Double]("l1_dist")
      assert(d >= 0.0 && d <= 2.0, s"L1 out of range: $row")
    }
    assert(r.exists(_.getAs[Double]("l1_dist") > 0.0), "all sources identical?")
  }

  test("q251: LOO identities recomputed from first principles") {
    val r = CurationQueries.queries("q251_source_ablation")(spark, sf01).collect()
    val docs = Tables.documents(spark, sf01)
      .select(col("source"), col("n_chars")).collect()
    val n = docs.length.toLong
    val chars = docs.map(_.getAs[Long]("n_chars")).sum
    val longs = docs.count(_.getAs[Long]("n_chars") >= 300).toLong
    r.foreach { row =>
      val src = row.getAs[String]("source")
      val mine = docs.filter(_.getString(0) == src)
      val nS = mine.length.toLong
      val charsS = mine.map(_.getAs[Long]("n_chars")).sum
      val expMean = BigDecimal((chars - charsS).toDouble / (n - nS))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(row.getAs[Double]("loo_mean_chars")) == expMean,
        s"LOO mean mismatch for $src")
      assert(row.getAs[Long]("n_docs") == nS)
      val longsS = mine.count(_.getAs[Long]("n_chars") >= 300).toLong
      val expShare = BigDecimal((longs - longsS).toDouble / (n - nS))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(BigDecimal(row.getAs[Double]("loo_share_long")) == expShare)
    }
  }

  test("q252: sampling weights concave vs counts; cumulative share monotone") {
    val r = TextQueries.queries("q252_neg_sampling")(spark, sf01)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(r.nonEmpty)
    var prevCum = 0.0
    var prevC = Long.MaxValue
    r.foreach { row =>
      val c = row.getAs[Long]("c"); val w = row.getAs[Double]("weight")
      assert(c <= prevC, "rank order broken"); prevC = c
      // concavity of ^0.75: weight grows slower than count
      assert(w <= c.toDouble && w >= math.pow(c.toDouble, 0.75) - 1e-6)
      val cum = row.getAs[Double]("cum_share")
      assert(cum >= prevCum - 1e-9, "cumulative share not monotone")
      prevCum = cum
      assert(row.getAs[Double]("share") >= 0.0 && cum <= 1.0 + 1e-9)
    }
  }

  test("q253: term-bearing docs outrank smoothing-only docs; scores negative") {
    val top = graft.queries.RetrievalQueries.queries("q253_ql_dirichlet")(spark, sf01)
      .collect()
    assert(top.length == 20)
    top.foreach(row => assert(row.getAs[Double]("ql_score") < 0.0))
    // every top-20 doc should actually contain at least one query term:
    // with mu=100 smoothing-only docs sit far below term-bearing ones
    val terms = Set("data", "model", "training")
    val ids = top.map(_.getAs[Long]("doc_id")).toSet
    val hits = Tables.documents(spark, sf01)
      .select(col("doc_id"), col("text")).collect()
      .filter(r => ids.contains(r.getLong(0)))
      .count(r => terms.exists(t =>
        r.getString(1).toLowerCase.split("[^a-z0-9]+").contains(t)))
    assert(hits == 20, s"only $hits of top-20 contain a query term")
  }

  test("q254: t sign tracks the mean difference; df in the Welch range") {
    val r = graft.queries.OpsQueries.queries("q254_welch_ttest")(spark, sf01).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val t = row.getAs[Double]("t_stat")
      val d = row.getAs[Double]("mean_s") - row.getAs[Double]("mean_rest")
      assert(math.signum(t) == math.signum(d) || d == 0.0)
      val n1 = row.getAs[Long]("n_docs")
      val total = r.map(_.getAs[Long]("n_docs")).sum
      val df = row.getAs[Double]("df")
      // Welch-Satterthwaite bounds: min(n1,n2)-1 <= df <= n1+n2-2
      assert(df >= math.min(n1, total - n1).toDouble - 1.0 - 1e-6,
        s"df below the Welch lower bound: $row")
      assert(df <= (total - 2).toDouble + 1e-6, s"df above n-2: $row")
    }
  }

  test("dynamic partition pruning fires on a partitioned-layout dim join") {
    import spark.implicits._
    // the partition-level complement to Snapshot's stats-file skipping
    // (51c): when the fact table is laid out partitioned-by-key, a
    // selective dim-side filter must reach the fact SCAN as a runtime
    // partition filter — at 100 TB this is the difference between
    // listing one partition and scanning the table.
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toFile
    try {
      Tables.events(spark, sf01)
        .write.mode("overwrite").partitionBy("event_type")
        .parquet(tmp.toString)
      val fact = spark.read.parquet(tmp.toString)
      // dim must be file-backed: a LocalRelation's filter constant-
      // folds away before the PartitionPruning rule can see it
      val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim")
        .resolve("dim").toFile
      Seq(("purchase", 1L), ("click", 2L), ("view", 3L),
        ("error", 4L), ("signup", 5L)).toDF("event_type", "type_id")
        .write.parquet(dimDir.toString)
      val dim = spark.read.parquet(dimDir.toString)
      val joined = fact.join(dim.filter(col("type_id") === 1L), "event_type")
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n$planStr")
      val expected = Tables.events(spark, sf01)
        .filter(col("event_type") === "purchase").count()
      assert(joined.count() == expected)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
  }

  test("decayed top-k state uses the explicit versioned layout and round-trips") {
    import graft.streaming.DecayTopK
    // round-15 fix: state is an explicit DataOutputStream layout (not
    // Java object serialization), so a Scala/JDK upgrade can never
    // orphan a checkpoint. Pin the exact bytes of an empty map and a
    // round-trip with multi-byte tokens.
    val m = Map("alpha" -> 40L, "日本語" -> 7L, "" -> 1L)
    val (m2, seq2) = DecayTopK.deserialize(DecayTopK.serialize(m, 3L))
    assert(m2 == m && seq2 == 3L)
    val empty = DecayTopK.serialize(Map.empty, 9L)
    // [int version=1][long seq=9][int n=0] = 16 bytes, big-endian
    assert(empty.toSeq == Seq[Byte](0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 9, 0, 0, 0, 0),
      s"layout drifted: ${empty.toSeq}")
    // a wrong version must fail loudly, not deserialize garbage
    val bad = empty.clone(); bad(3) = 2
    intercept[IllegalArgumentException](DecayTopK.deserialize(bad))
  }

  test("streaming decayed top-k: trending burst overtakes a larger stale count, state bounded") {
    import spark.implicits._
    import graft.streaming.DecayTopK
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // batch 0: alpha x40 + noise x1; batches 1-3: beta x6 each.
      // alpha's TOTAL (40) beats beta's (18), but halving per batch
      // leaves alpha at 5 vs beta at 10 — trending wins. Exact
      // trajectory: alpha 40→20→10→5; beta 6→9→10; noise prunes at 0.
      val batches: Seq[Seq[String]] = Seq(
        Seq.fill(40)("alpha") ++ Seq("noise"),
        Seq.fill(6)("beta"), Seq.fill(6)("beta"), Seq.fill(6)("beta"))
      val dir = java.nio.file.Files.createTempDirectory("graft-decaytopk")
      batches.zipWithIndex.foreach { case (toks, i) =>
        val stage = java.nio.file.Files.createTempDirectory(s"graft-decay-c$i")
        toks.map(t => (0L, t)).toDF("shard", "token")
          .coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = scala.jdk.CollectionConverters
          .IteratorHasAsScala(java.nio.file.Files.list(stage).iterator()).asScala
          .find(_.toString.endsWith(".parquet")).get
        val dst = dir.resolve(f"chunk$i%02d.parquet")
        java.nio.file.Files.move(part, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir.toString)
        .as[DecayTopK.Tok]
      val out = DecayTopK.monitor(stream, k = 3)
      val (table, progress) = graft.streaming.EventStream
        .runToCompletionAppendTracked(spark, out.toDF(), "graft_decay_topk")
      val rows = table.collect()
      val maxSeq = rows.map(_.getAs[Long]("seq")).max
      assert(maxSeq == 4L, s"expected 4 shard batches, got $maxSeq")
      val fin = rows.filter(_.getAs[Long]("seq") == maxSeq)
        .map(r => (r.getAs[String]("token"), r.getAs[Long]("decayed")))
        .sortBy { case (t, c) => (-c, t) }
      assert(fin.headOption.contains(("beta", 10L)), s"final slice: ${fin.toSeq}")
      assert(fin.contains(("alpha", 5L)), s"final slice: ${fin.toSeq}")
      assert(!fin.exists(_._1 == "noise"), "pruned token resurfaced")
      // one serialized map per active shard — never per token/batch
      val perBatchRows = progress.map(_.stateOperators.map(_.numRowsTotal).sum)
      assert(perBatchRows.nonEmpty && perBatchRows.max <= 1,
        s"state rows exceed shard count: $perBatchRows")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("q255: rule identities hold; supports dominate pair counts") {
    val r = graft.queries.AnalyticQueries.queries("q255_basket_rules")(spark, sf01).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val c = row.getAs[Long]("n_pair")
      val confAb = row.getAs[Double]("conf_ab")
      val confBa = row.getAs[Double]("conf_ba")
      val lift = row.getAs[Double]("lift")
      assert(confAb > 0.0 && confAb <= 1.0 && confBa > 0.0 && confBa <= 1.0)
      assert(lift > 0.0)
      assert(c >= 1)
      // lift = conf_ab / P(b) => lift/conf relations stay consistent:
      // conf_ab/conf_ba = supp_b/supp_a, so their ratio is finite
      assert(!lift.isNaN && !lift.isInfinite)
    }
  }

  test("q256: attributed purchase counts conserved between first- and last-touch") {
    val r = graft.queries.BehaviorQueries.queries("q256_attribution")(spark, sf01).collect()
    assert(r.nonEmpty)
    val nFirst = r.map(_.getAs[Long]("n_first")).sum
    val nLast = r.map(_.getAs[Long]("n_last")).sum
    assert(nFirst == nLast, "every attributed purchase has exactly one first and one last touch")
    val vFirst = r.map(_.getAs[Double]("val_first")).sum
    val vLast = r.map(_.getAs[Double]("val_last")).sum
    assert(math.abs(vFirst - vLast) < 1e-6, "value conservation broken")
    assert(r.forall(_.getAs[String]("channel") != "purchase"))
  }

  test("q257: HLL rolling estimates within 4%; day-merge equals direct window build") {
    import org.apache.spark.sql.functions.{expr => e}
    val r = graft.queries.SketchQueries.queries("q257_rolling_hll")(spark, sf01).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Double]("rel_err") <= 0.04,
        s"window estimate off by > 4%: $row")
    }
    // mergeability: union of per-day sketches == sketch built over the
    // union of days, for one concrete window
    val ev = Tables.events(spark, sf01)
      .select((unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"),
        col("user_id"))
    val days = ev.select("day").distinct().orderBy("day")
      .collect().map(_.getLong(0)).take(3)
    val direct = ev.filter(col("day").isin(days: _*))
      .agg(e("CAST(hll_sketch_estimate(hll_sketch_agg(user_id, 14)) AS LONG)"))
      .head().getLong(0)
    val merged = ev.filter(col("day").isin(days: _*))
      .groupBy(col("day")).agg(e("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(e("CAST(hll_sketch_estimate(hll_union_agg(sk, true)) AS LONG)"))
      .head().getLong(0)
    assert(direct == merged,
      s"sketch of union ($direct) != union of sketches ($merged)")
  }

  test("q258: DBSCAN role/cluster consistency laws hold") {
    val r = TextQueries.queries("q258_dbscan")(spark, sf01).collect()
    assert(r.length == Tables.embeddings(spark, sf01).count())
    val roles = r.groupBy(_.getAs[String]("role")).view.mapValues(_.length).toMap
    assert(roles.getOrElse("core", 0) > 0, "no core points at sf0.01")
    assert(roles.getOrElse("noise", 0) > 0, "no noise points at sf0.01")
    r.foreach { row =>
      val role = row.getAs[String]("role")
      val cl = row.getAs[Long]("cluster")
      if (role == "noise") assert(cl == -1L)
      else assert(cl >= 0L, s"clustered point without cluster: $row")
      if (role == "core") {
        // min-label convention: a core's cluster id is <= its own id
        assert(cl <= row.getAs[Long]("vec_id"))
      }
    }
    // cluster ids name core points: every cluster id is a core vec_id
    val coreIds = r.filter(_.getAs[String]("role") == "core")
      .map(_.getAs[Long]("vec_id")).toSet
    r.filter(_.getAs[Long]("cluster") >= 0).foreach { row =>
      assert(coreIds.contains(row.getAs[Long]("cluster")),
        s"cluster id is not a core point: $row")
    }
  }

  test("q259: Benford expectations form the log law; observed shares sum to 1") {
    val r = graft.queries.OpsQueries.queries("q259_benford")(spark, sf01).collect()
    assert(r.map(_.getAs[Int]("digit")).sorted.sameElements(1 to 9))
    val shareSum = r.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    val benfordSum = r.map(_.getAs[Double]("benford_share")).sum
    assert(math.abs(benfordSum - 1.0) < 1e-4)
    // the law is strictly decreasing in the digit
    val bs = r.sortBy(_.getAs[Int]("digit")).map(_.getAs[Double]("benford_share"))
    bs.sliding(2).foreach(p => assert(p(0) > p(1)))
    r.foreach(row => assert(row.getAs[Double]("chi2_part") >= 0.0))
  }

  test("q260: U + U' = n1*n2 identity; z sign tracks the rank-sum direction") {
    val r = graft.queries.OpsQueries.queries("q260_mann_whitney")(spark, sf01).collect()
    assert(r.nonEmpty)
    val total = r.map(_.getAs[Long]("n_s")).sum
    r.foreach { row =>
      val n1 = row.getAs[Long]("n_s"); val n2 = total - n1
      val u = row.getAs[Double]("u_stat")
      assert(u >= 0.0 && u <= n1.toDouble * n2,
        s"U out of [0, n1*n2]: $row")
      val z = row.getAs[Double]("z")
      val mu = n1.toDouble * n2 / 2
      assert(math.signum(z) == math.signum(u - mu) || u == mu)
    }
  }

  test("setSimJoin threshold generalization: t=0.8 results nest inside t=0.6") {
    import graft.operators.Dedup
    val base = Tables.documents(spark, sf01).select(col("doc_id"), col("text"))
    val docs = base.unionByName(base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val at06 = Dedup.setSimJoin(docs, "doc_id", "text", 3, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jac")).toMap
    val at08 = Dedup.setSimJoin(docs, "doc_id", "text", 3, 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jac")).toMap
    assert(at08.nonEmpty && at08.size <= at06.size)
    at08.foreach { case (pair, jac) =>
      assert(jac >= 0.8, s"pair below the 0.8 bar: $pair -> $jac")
      assert(at06.get(pair).contains(jac),
        s"t=0.8 pair missing or differs at t=0.6: $pair")
    }
    // exactly the 0.6-pairs meeting the 0.8 bar survive — the
    // threshold filters, never re-scores
    assert(at06.count(_._2 >= 0.8) == at08.size)
  }

  test("q261: LTV curves monotone per cohort; actives bounded by cohort size") {
    val r = graft.queries.BehaviorQueries.queries("q261_cohort_ltv")(spark, sf01)
      .collect()
    assert(r.nonEmpty)
    r.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("week_offset"))
      var prev = -1.0
      sorted.foreach { row =>
        assert(row.getAs[Long]("week_offset") >= 0L)
        assert(row.getAs[Long]("n_active") <= row.getAs[Long]("cohort_size"))
        val cum = row.getAs[Double]("cum_revenue")
        assert(cum >= prev - 1e-9, s"cumulative revenue regressed: $row")
        prev = cum
        assert(row.getAs[Double]("revenue") >= 0.0)
      }
      // offset 0 always exists (the cohort's own first week)
      assert(sorted.head.getAs[Long]("week_offset") == 0L)
    }
  }

  test("q244: 8 peel rounds reach the true 3-core fixpoint; member degrees >= 3") {
    val edges = Tables.orders(spark, sf01)
      .filter(col("o_orderkey") % 10 === 1)
      .select((col("o_custkey") % 200).as("a"), (col("o_orderkey") % 200).as("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") < col("b"))
    val r8 = Graph.kCore(edges, k = 3, rounds = 8).collect()
    assert(r8.nonEmpty, "3-core empty at sf0.01 — graph fixture degraded")
    r8.foreach { row =>
      assert(row.getAs[Long]("core_deg") >= 3L, s"member below k: $row")
    }
    // one more round is a no-op => the bounded unroll hit the fixpoint
    val r9 = Graph.kCore(edges, k = 3, rounds = 9).collect()
    assert(r8.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      r9.map(r => (r.getLong(0), r.getLong(1))).toSet,
      "round 9 changed the survivor set — not a fixpoint at 8 rounds")
  }
}
