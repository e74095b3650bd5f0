package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** SURVEY.md §2 addendum — pipeline-operations breadth: range joins,
  * deterministic holdout splits, exact quantiles, data profiling.
  */
object OpsQueries {

  /** q212's published z-ordered snapshot, cached per source dir so the
    * corpus-sized write+harvest runs once per JVM; the directory is
    * removed by a shutdown hook. */
  private val q212Cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def q212SnapshotFor(s: SparkSession, d: String): String =
    q212Cache.computeIfAbsent(d, { _ =>
      import graft.sources.Snapshot
      val base = java.nio.file.Files.createTempDirectory("graft-skip")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(p: java.io.File): Unit = {
          Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); ()
        }
        rm(base.toFile)
      }))
      val o = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01"))
          .cast("long").as("o_day"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      Snapshot.publishZOrdered(o, base.toString, "o_custkey", "o_day",
        nFiles = 16)
      base.toString
    })

  /** q235's bloom-indexed snapshot: documents STRIPED doc_id-mod-8
    * across 8 files (every file's [min,max] spans the domain — the
    * layout min/max pruning cannot help), with the per-file Bloom
    * point-index on doc_id. Cached per source dir like q212's. */
  private val q235Cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def q235SnapshotFor(s: SparkSession, d: String): String =
    q235Cache.computeIfAbsent(d, { _ =>
      import graft.sources.Snapshot
      val base = java.nio.file.Files.createTempDirectory("graft-bloomix")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(p: java.io.File): Unit = {
          Option(p.listFiles()).foreach(_.foreach(rm)); p.delete(); ()
        }
        rm(base.toFile)
      }))
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        // range-partition on the stripe id: exactly one stripe per
        // file (hash repartition collides stripes and leaves empty
        // partitions — file count would be layout-dependent)
        .repartitionByRange(8, col("doc_id") % 8)
      Snapshot.publishStatsIndexed(docs, base.toString,
        bloomCols = Seq("doc_id"))
      base.toString
    })

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // range self-join: same-user event pairs within 60 s, joined on
    // (user_id, 60s-time-bucket) ±1 — fan-out bounded by band
    // occupancy, not per-user history length (Temporal.bandedRangePairs).
    "q51_range_join" -> { (s, d) =>
      graft.operators.Temporal.bandedRangePairs(Tables.events(s, d),
        key = "user_id", timeCol = "ts", idCol = "event_id",
        bandMicros = 60000000L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_close_pairs"))
        .orderBy(col("user_id"))
    },

    // deterministic train/holdout split via content hash — the
    // reproducible sampling a training pipeline needs (no rand()).
    "q52_train_split" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(substring(md5(col("doc_id").cast("string")), 1, 1)
            .isin("0", "1", "2"), lit("holdout"))
            .otherwise(lit("train")).as("split"))
        .orderBy(col("doc_id"))
    },

    // exact interpolated median per group (sort-based quantile).
    "q53_median" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, 0.5)").as("median_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // data-quality expectations (round 6 — the Deequ-shaped validation
    // gate): all lineitem row predicates fold into ONE scan/aggregate,
    // plus a two-phase uniqueness check and a broadcast anti-join
    // referential-integrity check, unioned into one report.
    "q106_expectations" -> { (s, d) =>
      import graft.operators.Quality
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      Quality.expectations(li, Seq(
          "l_quantity_in_1_50" -> (col("l_quantity") < 1 or col("l_quantity") > 50),
          "l_extendedprice_positive" -> (col("l_extendedprice") <= 0),
          "l_discount_in_0_0.1" -> (col("l_discount") < 0 or col("l_discount") > 0.1),
          "l_shipdate_nonnull" -> col("l_shipdate").isNull))
        .unionByName(Quality.checkUnique(o, "o_orderkey_unique", Seq("o_orderkey")))
        .unionByName(Quality.checkForeignKey(li, o, "l_orderkey_fk",
          "l_orderkey", "o_orderkey"))
        .orderBy(col("constraint"))
    },

    // SCD-style upsert: merge an updates batch into the current
    // snapshot (update-else-insert, full-outer + coalesce — the
    // engine-level shape of MERGE INTO). Updates derived
    // deterministically from the data itself.
    "q57_upsert_merge" -> { (s, d) =>
      val current = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      // updates: raise balance 10% for segment BUILDING + 3 new rows.
      // DECIMAL arithmetic, not double: Spark's round(double) rounds
      // the shortest decimal rendering while DuckDB rounds the raw
      // binary value — exact decimals round identically in both.
      val updates = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 2))
            * lit("1.1").cast(org.apache.spark.sql.types.DecimalType(3, 2)), 2)
            .cast("double").as("c_acctbal"))
        .unionByName(
          s.range(1, 4).select(
            (col("id") + 1000000).as("c_custkey"),
            concat(lit("NewCustomer#"), col("id")).as("c_name"),
            lit(0.0).as("c_acctbal")))
      val u = updates.select(col("c_custkey"),
        col("c_name").as("u_name"), col("c_acctbal").as("u_bal"))
      current.join(u, Seq("c_custkey"), "full_outer")
        .select(col("c_custkey"),
          coalesce(col("u_name"), col("c_name")).as("c_name"),
          coalesce(col("u_bal"), col("c_acctbal")).as("c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    // §2.1 (round 9) — CDC APPLY with deletes and last-wins conflict
    // resolution: q57's MERGE handles update-else-insert; a real
    // change feed also carries D rows and multiple ops per key. The
    // feed here plants all three op kinds INCLUDING a U-then-D
    // conflict (BUILDING keys divisible by 10 with remainder 3 get
    // both); resolution is one (key) window taking the max-seq op
    // (deterministic op tie-break), then a full-outer join applies
    // U/I column-wise and D drops the key. Two shuffles on the key —
    // the feed is delta-sized, the snapshot scanned once.
    "q168_cdc_apply" -> { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(18, 2)
      val current = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val feed = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), lit("U").as("op"), lit(1L).as("seq"),
          col("c_name").as("f_name"),
          round(col("c_acctbal").cast(dec) * lit("1.1").cast(
            org.apache.spark.sql.types.DecimalType(3, 2)), 2)
            .cast("double").as("f_bal"))
        .unionByName(Tables.customer(s, d)
          .filter(col("c_custkey") % 10 === 3)
          .select(col("c_custkey"), lit("D").as("op"), lit(2L).as("seq"),
            lit(null).cast("string").as("f_name"),
            lit(null).cast("double").as("f_bal")))
        .unionByName(s.range(1, 4).select(
          (col("id") + 2000000).as("c_custkey"), lit("I").as("op"),
          lit(1L).as("seq"),
          concat(lit("Inserted#"), col("id")).as("f_name"),
          lit(100.0).as("f_bal")))
      val w = Window.partitionBy(col("c_custkey"))
        .orderBy(col("seq").desc, col("op"))
      val latest = feed.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn", "seq")
      current.join(latest, Seq("c_custkey"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(col("c_custkey"),
          coalesce(col("f_name"), col("c_name")).as("c_name"),
          coalesce(col("f_bal"), col("c_acctbal")).as("c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    // multi-dimensional lattice: CUBE over (nation, segment) — all
    // four grouping-set combinations in one pass.
    "q55_cube" -> { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
    },

    // approximate heavy hitters: top boilerplate tokens per language
    // via a Space-Saving TypedImperativeAggregate (bounded state,
    // map-side mergeable — no token-space groupBy). Exploded long
    // layout, deterministic rank by estimated count then token.
    "q56_heavy_hitters" -> { (s, d) =>
      import graft.functions.GraftFunctions
      import graft.functions.HeavyHitters.heavyHitters
      Tables.documents(s, d)
        .select(col("lang"), explode(GraftFunctions.normWords(col("text"))).as("w"))
        .groupBy(col("lang"))
        .agg(heavyHitters(col("w"), capacity = 256, k = 10).as("hh"))
        .select(col("lang"), posexplode(col("hh")))
        .select(col("lang"), (col("pos") + 1).as("rank"),
          col("col.item").as("token"), col("col.est_count").as("est_count"))
        .orderBy(col("lang"), col("rank"))
    },

    // data profiling: per-column null counts / distinct counts /
    // ranges — the audit pass an ingest pipeline runs on every load.
    "q54_profile" -> { (s, d) =>
      Tables.customer(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("c_name").isNull.cast("long")).as("null_name"),
          countDistinct(col("c_mktsegment")).as("distinct_segments"),
          countDistinct(col("c_nationkey")).as("distinct_nations"),
          // Emit balance bounds as integer cents: raw double min/max are
          // render-sensitive across oracle-engine versions (15-sig-digit
          // repr differences); exact integers hash identically everywhere.
          round(min(col("c_acctbal")) * 100, 0).cast("long").as("min_bal_cents"),
          round(max(col("c_acctbal")) * 100, 0).cast("long").as("max_bal_cents"))
    },

    // SCD type-2 dimension history: each customer's orders become
    // validity intervals (from, to) in epoch micros, NULL = current.
    "q90_scd2" -> { (s, d) =>
      graft.operators.Temporal.scd2(Tables.orders(s, d),
        key = "o_custkey", timeCol = "o_orderdate", idCol = "o_orderkey")
        .orderBy(col("o_custkey"), col("valid_from_us"), col("o_orderkey"))
    },

    // PageRank by power iteration over a deterministic graph derived
    // from the orders table. Hash-oracled since round 6: contributions
    // quantize to DECIMAL(28,14) before each per-dst sum (exact,
    // order-independent addition), so the DuckDB oracle unrolls the
    // same 5 iterations as chained CTEs and matches bit-for-bit.
    "q91_pagerank" -> { (s, d) =>
      val edges = Tables.orders(s, d)
        .select((col("o_custkey") % 200).as("src"), (col("o_orderkey") % 200).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.operators.Graph.pageRank(edges, iters = 5)
        .select(col("id"), round(col("rank"), 6).as("rank"))
        .orderBy(col("id"))
    },

    // embedding-column profiling without any order-sensitive float
    // reduction: size, positional elements, min/max — every output is
    // an exact float widened to double, so the vector audit
    // oracle-checks bit-for-bit (sums/means deliberately excluded;
    // those live in the spec-bounded ANN paths).
    "q99_vector_profile" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("n_dims"),
          element_at(col("embedding"), 1).cast("double").as("first_val"),
          element_at(col("embedding"), 33).cast("double").as("mid_val"),
          array_min(col("embedding")).cast("double").as("min_val"),
          array_max(col("embedding")).cast("double").as("max_val"))
        .orderBy(col("vec_id"))
    },

    // snapshot-diff CDC: two deterministic snapshots of orders (drops
    // + price updates) full-outer-joined into an insert/delete/update
    // change feed — the incremental-load audit every warehouse sync
    // needs. ONE shuffle on the key; money emitted as exact cents.
    "q100_snapshot_diff" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val old = o.filter(col("o_orderkey") % 10 =!= 3)
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("old_cents"))
      val neu = o.filter(col("o_orderkey") % 10 =!= 7)
        .select(col("o_orderkey"),
          round(when(col("o_orderkey") % 5 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")) * 100, 0).cast("long").as("new_cents"))
      old.join(neu, Seq("o_orderkey"), "full_outer")
        .withColumn("change_type",
          when(col("old_cents").isNull, "insert")
            .when(col("new_cents").isNull, "delete")
            .when(col("old_cents") =!= col("new_cents"), "update")
            .otherwise("unchanged"))
        .filter(col("change_type") =!= "unchanged")
        .orderBy(col("o_orderkey"))
    },

    // §4 skew mitigation as a first-class query: a PLANTED hot key
    // (3 of 4 lineitem rows collapse onto key 0) joined to a small
    // key dimension through Skew.saltedJoin — the deterministic-salt
    // N-way spread for hot keys too pathological for AQE's skew
    // split. Result must equal the plain join (the oracle IS the
    // plain join); SkewSpec plan-asserts the shuffle key includes
    // the salt.
    "q111_salted_join" -> { (s, d) =>
      val li = Tables.lineitem(s, d).select(
        when(col("l_orderkey") % 4 =!= 0, lit(0L))
          .otherwise(col("l_orderkey") % 100).as("hot_key"),
        col("l_partkey"), col("l_quantity"))
      val dim = s.range(0, 100).select(col("id").as("hot_key"),
        (col("id") % 7).as("bucket7"))
      graft.operators.Skew.saltedJoin(li, dim, "hot_key",
          leftSaltSource = col("l_partkey"), salts = 8)
        .groupBy(col("bucket7"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy(col("bucket7"))
    },

    // Matryoshka-style embedding truncation audit (round 7 —
    // Kusupati et al. 2022): keep the first 16 of 64 dims and measure
    // what survives — norms, retained energy, and the cosine between
    // the truncated and full vector (= √(e16/e64) in closed form, so
    // no second pass). One narrow codegen'd projection per vector;
    // the decision input for running ANN at quarter cost. Sums are
    // index-order folds on both engines; outputs round(6) per the
    // q112 cosine precedent.
    "q122_embed_truncate" -> { (s, d) =>
      def sq(c: org.apache.spark.sql.Column) =
        aggregate(c, lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          sq(slice(col("embedding"), 1, 16)).as("e16"),
          sq(col("embedding")).as("e64"))
        .select(col("vec_id"),
          round(sqrt(col("e16")), 6).as("norm16"),
          round(sqrt(col("e64")), 6).as("norm64"),
          round(col("e16") / col("e64"), 6).as("energy_retained"),
          round(sqrt(col("e16") / col("e64")), 6).as("cos_trunc_full"))
        .orderBy(col("vec_id"))
    },

    // incremental aggregate maintenance (round 7): the materialized-
    // view refresh pattern — a per-customer order rollup kept current
    // by MERGING a delta batch's partial aggregate into the stored
    // aggregate, never rescanning the base. Works because the state
    // is ALGEBRAIC (count, DECIMAL sum, max): combine = elementwise
    // merge on the key, a full-outer join of aggregate-sized tables
    // (≪ facts). The oracle recomputes from ALL facts directly, so
    // the hash match PROVES base ⊕ delta ≡ recompute. At 100 TB this
    // is the difference between a nightly scan and a delta-sized job.
    "q135_incremental_agg" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      def rollup(df: DataFrame): DataFrame = df
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total"),
          max(col("o_orderdate")).as("last_order"))
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderdate"))
      // base = the standing view; delta = the new ingest slice
      val base = rollup(orders.filter(col("o_orderkey") % 10 =!= 3)
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderdate")))
      val delta = rollup(orders.filter(col("o_orderkey") % 10 === 3)
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderdate")))
      base.select(col("o_custkey"), col("n_orders").as("bn"),
          col("total").as("bt"), col("last_order").as("bl"))
        .join(delta.select(col("o_custkey"), col("n_orders").as("dn"),
          col("total").as("dt"), col("last_order").as("dl")),
          Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("bt"), lit(0).cast(DecimalType(18, 2)))
            + coalesce(col("dt"), lit(0).cast(DecimalType(18, 2))))
            .cast("double").as("total"),
          unix_micros(greatest(col("bl"), col("dl")).cast("timestamp"))
            .as("last_order_us"))
        .orderBy(col("o_custkey"))
    },

    // per-group embedding centroids (round 7): element-wise mean
    // pooling per label — the k-means M-step / class-prototype table,
    // and the chunk→document pooling shape. Each float quantizes to
    // DECIMAL(28,12) BEFORE the sum (the q114 discipline), so the
    // per-(label, dim) reduction is exact and order-independent at
    // any partitioning; posexplode fans each vector into (dim, value)
    // rows and the one shuffle is a partial agg on the BOUNDED
    // (label × dim) key domain — never on vectors.
    "q134_group_centroids" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos").cast("long").as("dim"),
          col("col").cast("double")
            .cast(org.apache.spark.sql.types.DecimalType(28, 12)).as("vq"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("vq")).cast("double") / count(lit(1)), 6).as("centroid"))
        .orderBy(col("label"), col("dim"))
    },

    // embedding OUTLIER detection (round 7): distance-to-class-
    // centroid with a per-label p95 gate — the mislabeled-data /
    // embedding-quality audit run before clustering or dedup trusts
    // the vectors. Centroids via the q134 DECIMAL-exact mean
    // discipline; squared diffs re-quantize to DECIMAL(28,12) so the
    // per-vector reduction is order-independent; the centroid and
    // threshold frames are (label × dim)- and label-sized — both
    // broadcast, so vectors shuffle only for their own partial aggs.
    "q142_embed_outliers" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val dec = org.apache.spark.sql.types.DecimalType(28, 12)
      val pe = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos").cast("long").as("dim"),
          col("col").cast("double").as("v"))
        .scopedPersist() // consumers: centroid agg + distance join
      val cent = pe.groupBy(col("label"), col("dim"))
        .agg((sum(col("v").cast(dec)).cast("double") / count(lit(1))).as("c"))
      val dist = pe.join(broadcast(cent), Seq("label", "dim"))
        .select(col("vec_id"), col("label"),
          ((col("v") - col("c")) * (col("v") - col("c"))).cast(dec).as("sq"))
        .groupBy(col("vec_id"), col("label"))
        .agg(round(sqrt(sum(col("sq")).cast("double")), 6).as("dist"))
        .scopedPersist() // consumers: threshold agg + verdict join
      val thr = dist.groupBy(col("label"))
        .agg(round(expr("percentile(dist, 0.95)"), 6).as("p95"))
      dist.join(broadcast(thr), "label")
        .select(col("vec_id"), col("label"), col("dist"), col("p95"),
          (col("dist") > col("p95")).as("is_outlier"))
        .orderBy(col("vec_id"))
    },

    // PSI drift detection (round 7): population-stability index of the
    // doc-length distribution between a reference slice and a live
    // slice — the monitoring gate that catches a corpus drifting
    // before a model trains on it. Laplace-smoothed bin shares (no
    // zero-bin infinities), one groupBy + a 1-row broadcast; per-bin
    // PSI terms emitted (Σ terms = the headline PSI).
    "q123_psi_drift" -> { (s, d) =>
      val binned = Tables.documents(s, d)
        .select(least(lit(4L), floor(col("n_chars") / lit(100)).cast("long"))
            .as("bin"),
          (col("doc_id") % 2 === 0).as("is_ref"))
      val agg = binned.groupBy(col("bin"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).cast("long").as("n_ref"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).cast("long").as("n_live"))
      val tot = agg.agg(sum(col("n_ref")).cast("long").as("t_ref"),
        sum(col("n_live")).cast("long").as("t_live"))
      val pLive = (col("n_live") + lit(1.0)) / (col("t_live") + lit(5))
      val pRef = (col("n_ref") + lit(1.0)) / (col("t_ref") + lit(5))
      agg.crossJoin(broadcast(tot))
        .select(col("bin"), col("n_ref"), col("n_live"),
          round(pRef, 6).as("p_ref"),
          round(pLive, 6).as("p_live"),
          round((pLive - pRef) * log(pLive / pRef), 6).as("psi_term"))
        .orderBy(col("bin"))
    },

    // keyed pseudonymization (round 7): PII-safe stable surrogate keys
    // — sha-256 over a salted natural key replaces the id everywhere
    // while PRESERVING referential integrity, proven by aggregating a
    // fact table through the pseudonym instead of the raw key. The
    // hash is a narrow codegen'd projection on both sides of the join
    // (no lookup table to secure or replicate); the salt would be a
    // secret in production — a literal here so the oracle reproduces.
    "q121_pseudonymize" -> { (s, d) =>
      val pseud = sha2(concat(lit("graft-salt-v1:"),
        col("o_custkey").cast("string")), 256)
      Tables.orders(s, d)
        .select(pseud.as("pseud"),
          col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2))
            .as("price"))
        .groupBy(col("pseud"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast("double").as("total_price"))
        .orderBy(col("pseud"))
    },

    // §2.3 (round 9) — distributed PCA over the embedding corpus
    // (rows-only; orthonormality / variance-identity / invariance
    // invariants in PcaSpec): ONE corpus pass computes Σv and ΣvvT
    // via the MomentVector kernel + exact-decimal vector aggregate
    // (d²-bounded state, bit-identical under any partitioning), the
    // d×d Jacobi eigensolve is driver-side (d-bounded — the BPE
    // merge-table contract), and the report is the per-component
    // variance ledger an embedding pipeline reads before truncating
    // or whitening. The corpus never shuffles.
    "q171_pca" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val dim = emb.select(size(col("embedding"))).head.getInt(0)
      val model = graft.operators.Pca.fit(emb, "embedding", dim)
      graft.operators.Pca.componentReport(s, model, k = 8)
        .orderBy(col("component"))
    },

    // §4 skew DIAGNOSTIC as a first-class query: the report run
    // BEFORE choosing a mitigation — q111's planted hot key surfaced
    // as the top-10 hottest join keys with share, skew factor
    // (count / mean-per-key), and the salt width Skew.saltedJoin
    // would need (⌈skew⌉). One key groupBy + a broadcast 1-row
    // total; at 100 TB this is the cheap pre-flight that decides
    // between AQE, salting, or a broadcast rewrite.
    "q187_skew_advisor" -> { (s, d) =>
      val keyed = Tables.lineitem(s, d).select(
        when(col("l_orderkey") % 4 =!= 0, lit(0L))
          .otherwise(col("l_orderkey") % 100).as("hot_key"))
      val byKey = keyed.groupBy(col("hot_key")).agg(count(lit(1)).as("cnt"))
      val tot = byKey.agg(sum(col("cnt")).cast("long").as("total"),
        count(lit(1)).as("n_keys"))
      val w = Window.orderBy(col("cnt").desc, col("hot_key"))
      byKey.crossJoin(broadcast(tot))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .select(col("rnk").as("rank"), col("hot_key"), col("cnt"),
          round(col("cnt") / col("total"), 6).as("share"),
          round((col("cnt") * col("n_keys")) / col("total"), 6)
            .as("skew_factor"),
          ceil((col("cnt") * col("n_keys")) / col("total")).cast("long")
            .as("recommended_salt"))
        .orderBy(col("rank"))
    },

    // §2.3 (round 11) — k-NN label-noise detection (the confident-
    // learning/Cleanlab shape): a vector whose k=5 nearest cosine
    // neighbors majority-vote a DIFFERENT label is a mislabel suspect
    // — run before a labeled slice trains a filter model. Eval-set
    // contract enforced (lazy guard); ranking by the round(.,6)
    // cosine + vec_id tie-break, the render-stable boundary both
    // engines compute identically (q34 discipline). Majority via a
    // single max(struct) argmax — ties break to the SMALLER label.
    // Scale path: swap bruteForceTopK for Similarity.annLsh candidates
    // at corpus scale; the vote/verdict algebra is unchanged.
    "q193_knn_label_noise" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      import graft.operators.{Retrieval, Similarity}
      val sl = Tables.embeddings(s, d).filter(col("vec_id") < 300)
        .select(col("vec_id"), col("label"), col("embedding"))
        .scopedPersist() // consumers: query side + corpus side + label joins
      val slg = Retrieval.requireEvalBounded(sl, 10000L,
        "q193 label-noise eval slice")
      val knn = Similarity.bruteForceTopK(sl, slg, k = 5)
      val votes = knn
        .join(broadcast(sl.select(col("vec_id").as("neighbor_id"),
          col("label").as("n_label"))), "neighbor_id")
        .join(broadcast(sl.select(col("vec_id").as("query_id"),
          col("label"))), "query_id")
        .groupBy(col("query_id"), col("label"), col("n_label"))
        .agg(count(lit(1)).as("cnt"))
      votes.groupBy(col("query_id"), col("label"))
        .agg(max(struct(col("cnt"), (-col("n_label")).as("neg"))).as("w"),
          sum(when(col("n_label") === col("label"), col("cnt"))
            .otherwise(0L)).as("n_agree"))
        .select(col("query_id").as("vec_id"), col("label"),
          (-col("w.neg")).as("knn_label"), col("w.cnt").as("n_votes"),
          col("n_agree"),
          ((-col("w.neg")) =!= col("label")).as("suspect"))
        .orderBy(col("vec_id"))
    },

    // §2.3 (round 11) — JOIN-STRATEGY advisor, q187's sibling: before
    // a star-schema join is planned, measure each table's estimated
    // in-memory bytes (typed column widths: 8/numeric+ts, 4/int32,
    // octet_length+4/string) and advise BROADCAST for dimension sides
    // under the 10 MiB autoBroadcastJoinThreshold, SHUFFLE otherwise
    // — the decision a plan reviewer makes by hand, as a query. One
    // single-row aggregate per table; integer arithmetic end to end,
    // headroom published as the exact bytes/threshold ratio.
    "q202_join_advisor" -> { (s, d) =>
      def strW(c: String) = octet_length(col(c)) + lit(4)
      def est(df: DataFrame, name: String, role: String,
              w: org.apache.spark.sql.Column) =
        df.agg(count(lit(1)).as("n_rows"),
            sum(w.cast("long")).cast("long").as("est_bytes"))
          .select(lit(name).as("table_name"), lit(role).as("role"),
            col("n_rows"), col("est_bytes"),
            when(lit(role) === "dim" && col("est_bytes") <= 10485760L,
              lit("BROADCAST")).otherwise(lit("SHUFFLE")).as("advice"),
            round(col("est_bytes") / lit(10485760.0), 6)
              .as("threshold_ratio"))
      est(Tables.region(s, d), "region", "dim", lit(4) + strW("r_name"))
        .unionByName(est(Tables.nation(s, d), "nation", "dim",
          lit(8) + strW("n_name")))
        .unionByName(est(Tables.customer(s, d), "customer", "dim",
          lit(20) + strW("c_name") + strW("c_mktsegment")))
        .unionByName(est(Tables.supplier(s, d), "supplier", "dim",
          lit(20) + strW("s_name")))
        .unionByName(est(Tables.part(s, d), "part", "dim",
          lit(20) + strW("p_name") + strW("p_brand") + strW("p_type")))
        .unionByName(est(Tables.orders(s, d), "orders", "fact",
          lit(32) + strW("o_orderstatus") + strW("o_orderpriority")))
        .unionByName(est(Tables.lineitem(s, d), "lineitem", "fact",
          lit(68) + strW("l_returnflag") + strW("l_linestatus")))
        .orderBy(col("table_name"))
    },

    // §2.5 #51 (round 11, first ORACLED probe of the Z-order row) —
    // Morton-tile audit: orders keyed on (o_custkey, order day) get
    // the same exact-integer 16-bit normalization + codegen'd bit
    // interleave that Layout.zorderWrite clusters files by, then a
    // 64-tile rollup shows each tile covering a small rectangle in
    // BOTH dimensions — the file-skipping property a 1-D sort cannot
    // give the second column. All arithmetic is exact integers (the
    // norm runs in decimal(38,0) `div`), so the tile extents hash
    // bit-identically against DuckDB's bit-arithmetic mirror. At
    // 100 TB the only added cost over any sorted write is the
    // 1-row bounds broadcast.
    // §2.2/§2.5 (round 12) — SNAPSHOT DATA-SKIPPING end-to-end: orders
    // (projected to the integral key domain, the q208 discipline)
    // publish Z-ORDERED on (o_custkey, o_day) into a snapshot
    // generation whose per-file min/max manifest is harvested from
    // parquet FOOTERS (metadata-only), then a selective 2-D range
    // predicate reads back through Snapshot.readWhere — the pruned
    // path opens only the files whose [min,max] intervals can satisfy
    // the predicate (SnapshotSpec asserts the file-count drop; at
    // 100 TB that pruning IS the query time) and re-applies the full
    // row filter, so the aggregate below is hash-identical to
    // DuckDB's plain filtered scan of the source table BY
    // CONSTRUCTION — which is exactly what this oracle proves.
    "q212_pruned_read" -> { (s, d) =>
      import graft.sources.{Snapshot, SnapshotStats}
      import SnapshotStats.StatsPred.{And => PAnd, Between}
      // Publish once per (session, source dir) and clean up at JVM
      // exit: repeated invocations (bench retry passes) measure the
      // PRUNED READ, not a fresh corpus republish, and /tmp no longer
      // accumulates one z-ordered orders copy per run.
      val base = q212SnapshotFor(s, d)
      val pred = PAnd(Between("o_custkey", 10L, 60L),
        Between("o_day", 365L, 1095L))
      Snapshot.readWhere(s, base, pred)
        .groupBy(floor(col("o_day") / 91).cast("long").as("qtr"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).cast("long").as("sum_cents"),
          countDistinct(col("o_custkey")).as("n_custs"),
          min(col("o_orderkey")).as("min_okey"),
          max(col("o_orderkey")).as("max_okey"))
        .orderBy(col("qtr"))
    },

    "q208_zorder_tiles" -> { (s, d) =>
      import graft.operators.Layout
      val o = Tables.orders(s, d).select(
        col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01"))
          .cast("long").as("o_day"))
      Layout.withZKey(o, "o_custkey", "o_day")
        .withColumn("tile", shiftrightunsigned(col("__z"), 26))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("__z")).as("z_min"), max(col("__z")).as("z_max"),
          min(col("o_custkey")).as("ck_min"), max(col("o_custkey")).as("ck_max"),
          min(col("o_day")).as("day_min"), max(col("o_day")).as("day_max"))
        .orderBy(col("tile"))
    },

    // §2.5/§2.2 (round 13) — SMALL-FILE COMPACTION PLANNER: the
    // maintenance job every 100 TB table needs (streaming sinks and
    // per-partition writers leave thousands of KB-scale files; scan
    // cost is then per-FILE, not per-byte). Input is a file ledger —
    // here derived from lineitem shards (l_orderkey % 97 → "file",
    // exact cents as its byte size) so the plan is oracled; in
    // production it comes from Snapshot's _STATS manifest (q212
    // machinery) without touching data. Plan: next-fit by cumulative
    // size over files ordered size-DESC — file f lands in bin
    // floor(prefix_sum_before(f) / target) with target = total//12+1,
    // all exact integers. The ledger is ≤97 rows BY CONSTRUCTION
    // (an aggregate under the window satisfies the plan audit's
    // bounded rule): the planner shuffles metadata, never data, so
    // the only corpus-scale cost is the one groupBy that builds the
    // ledger — and against a stats manifest even that disappears.
    "q221_compaction_plan" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ledger = Tables.lineitem(s, d)
        .select((col("l_orderkey") % 97).as("shard"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
        .groupBy(col("shard"))
        .agg(sum(col("cents")).as("f_bytes"), count(lit(1)).as("n_rows"))
      val tot = ledger.agg(sum(col("f_bytes")).as("total"))
      val w = Window.orderBy(col("f_bytes").desc, col("shard"))
      ledger.crossJoin(broadcast(tot))
        .withColumn("target", expr("total div 12") + 1L)
        .withColumn("prev",
          coalesce(sum(col("f_bytes")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("bin", expr("prev div target"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("f_bytes")).as("bin_bytes"),
          sum(col("n_rows")).cast("long").as("bin_rows"),
          min(col("shard")).as("min_shard"), max(col("shard")).as("max_shard"),
          round(max(col("f_bytes")).cast("double") /
            min(col("f_bytes")), 6).as("skew"))
        .orderBy(col("bin"))
    },

    // §2.5 (round 13) — BLOOM RUNTIME-FILTER SEMIJOIN reduction: the
    // dimension-filter-pushed-into-the-fact-scan technique every
    // 100 TB warehouse join depends on (Spark's own runtime filters /
    // DPP, made explicit on graft's Bloom machinery from 48b). A
    // selective predicate keeps ~2% of orders; instead of shuffling
    // ALL of lineitem into the join, the order keys fold into a
    // 16 KiB Bloom filter (ONE mergeable aggregate), broadcast as a
    // 1-row frame, and probe INSIDE the lineitem scan's codegen'd
    // filter — rows that cannot join never reach the exchange. False
    // positives are removed by the real join that follows; false
    // negatives are impossible, so the result is HASH-IDENTICAL to
    // the plain join (the oracle proves it). Round13Spec additionally
    // pins the reduction: probe-survivor count ≪ lineitem count, and
    // parity with the unfiltered plan.
    "q228_bloom_semijoin" -> { (s, d) =>
      import graft.functions.BloomFunctions
      val dim = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 150000.0)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val bloom = dim.agg(BloomFunctions.bloomAgg(
        col("o_orderkey").cast("string"), 1 << 17, 5).as("bits"))
      // round 17: fan the probe side out iff the scan is under-parallel
      // (one-row-group file = one split): each probed row pays a
      // filter-bytes materialization, so a single-split scan serializes
      // ~10 GB of 16 KB copies on one core; filter→join→agg is
      // partition-invariant, and at real scale this is a no-op
      val pre = locally {
          import graft.Caching.FanOut
          Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
            .fanOutSmallScan()
        }
        .crossJoin(broadcast(bloom)) // 1-row filter frame
        .filter(BloomFunctions.bloomContains(
          col("bits"), col("l_orderkey").cast("string"), 5))
        .drop("bits")
      pre.join(dim, pre("l_orderkey") === dim("o_orderkey"))
        .groupBy(col("o_year"))
        .agg(countDistinct(col("o_orderkey")).as("n_orders"),
          count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("o_year"))
    },

    // §2.5 (round 13) — ANALYZE-style COLUMN STATISTICS collection:
    // the optimizer-statistics pass (`ANALYZE TABLE ... COMPUTE
    // STATISTICS FOR COLUMNS`) made an explicit, auditable query —
    // these numbers are what q202's join advisor, q224's cardinality
    // estimates and the CBO's broadcast decisions consume. Per
    // analyzed column of orders: row/null/exact-NDV counts, numeric
    // min/max, exact interpolated quartiles (the equi-depth histogram
    // edges), string min/max, and the most-common value with its
    // count (ties break to the smaller value — render-stable). MCV
    // strings only for bounded-domain columns; a double's MCV is
    // meaningless and stays NULL. Scale shape: one aggregate per
    // column (partial-combining; the quantile is the one full-sort
    // component — at 100 TB swap in the KLL sketch q161 for the same
    // columns) + one dimension-bounded top-1 groupBy for the MCV.
    "q231_analyze_stats" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val o = Tables.orders(s, d).scopedPersist()
      def numStats(c: String): DataFrame = o.agg(
        count(lit(1)).as("n"),
        sum(col(c).isNull.cast("long")).as("n_nulls"),
        countDistinct(col(c)).as("ndv"),
        round(min(col(c)).cast("double"), 6).as("min_num"),
        round(max(col(c)).cast("double"), 6).as("max_num"),
        round(expr(s"percentile($c, 0.25)"), 6).as("q25"),
        round(expr(s"percentile($c, 0.5)"), 6).as("q50"),
        round(expr(s"percentile($c, 0.75)"), 6).as("q75"))
        .select(lit(c).as("col_name"), col("n"), col("n_nulls"),
          col("ndv"), col("min_num"), col("max_num"),
          col("q25"), col("q50"), col("q75"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"),
          lit(null).cast("string").as("mcv"),
          lit(null).cast("long").as("mcv_cnt"))
      val prio = o.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("o_orderpriority"))
        .limit(1)
        .select(col("o_orderpriority").as("mcv"), col("c").as("mcv_cnt"))
      val strStats = o.agg(
        count(lit(1)).as("n"),
        sum(col("o_orderpriority").isNull.cast("long")).as("n_nulls"),
        countDistinct(col("o_orderpriority")).as("ndv"),
        min(col("o_orderpriority")).as("min_str"),
        max(col("o_orderpriority")).as("max_str"))
        .crossJoin(broadcast(prio)) // 1-row MCV frame
        .select(lit("o_orderpriority").as("col_name"), col("n"),
          col("n_nulls"), col("ndv"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          lit(null).cast("double").as("q25"),
          lit(null).cast("double").as("q50"),
          lit(null).cast("double").as("q75"),
          col("min_str"), col("max_str"), col("mcv"), col("mcv_cnt"))
      numStats("o_custkey")
        .unionByName(numStats("o_totalprice"))
        .unionByName(strStats)
        .orderBy(col("col_name"))
    },

    // §2.3 (round 13) — RENDEZVOUS (HRW) HASHING reshard audit
    // (Thaler & Ravishankar '96, the consistent-placement scheme
    // behind Ceph/Riak-style sharding): mod-N placement (q85's shard
    // shuffle) moves ~(1 − 1/M) of ALL keys when N→M; highest-random-
    // weight placement — shard(doc) = argmax_s md5(doc '#' s) — moves
    // ONLY the keys whose argmax lands on a NEW shard, exactly
    // (M−N)/M in expectation, and never between surviving shards.
    // The audit plans a 12→16 expansion: per old shard, how many docs
    // sit there and how many will move (all of them to shards 12–15 —
    // Round13Spec pins that invariant doc-by-doc). Scale shape: the
    // assignment is a NARROW per-row array-argmax over M ≤ 16 inline
    // candidates (no shuffle, no doc×M row blow-up in the Spark plan;
    // the oracle spells the same argmax relationally), then one
    // partial-agg groupBy on shard id.
    "q232_rendezvous_reshard" -> { (s, d) =>
      def hrwShard(n: Int): org.apache.spark.sql.Column =
        array_max(transform(sequence(lit(0), lit(n - 1)),
          sh => struct(
            md5(concat_ws("#", col("doc_id"), sh)).as("h"),
            sh.as("s"))))("s")
      Tables.documents(s, d)
        .select(col("doc_id"), hrwShard(12).as("old_shard"),
          hrwShard(16).as("new_shard"))
        .groupBy(col("old_shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("new_shard") =!= col("old_shard")).cast("long"))
            .as("n_moved"))
        .select(col("old_shard").cast("int").as("old_shard"),
          col("n_docs"), col("n_moved"),
          round(col("n_moved").cast("double") / col("n_docs"), 6)
            .as("frac_moved"))
        .orderBy(col("old_shard"))
    },

    // §2.5 (round 13) — BLOOM POINT-INDEX read path (51d): q212 prunes
    // RANGE predicates because z-order makes per-file [min,max] tight;
    // a point lookup on an UNCLUSTERED high-cardinality key (this
    // fixture stripes doc_id mod 8, so every file's range spans the
    // whole domain) matches every file's stats and min/max prunes
    // NOTHING. The `_BLOOM.tsv` sidecar — one 8 KiB mergeable Bloom
    // per (file, column), built in ONE publish-time pass — answers
    // "can this file contain the key?" so each equality probe opens
    // ~1 file of 8 (Round13Spec pins kept ≤ 2 per probe; false
    // negatives are impossible, so the result is HASH-IDENTICAL to
    // the plain scan — this oracle). Three point probes, unioned.
    "q235_bloom_point_read" -> { (s, d) =>
      import graft.sources.Snapshot
      import graft.sources.SnapshotStats.StatsPred.EqualTo
      val base = q235SnapshotFor(s, d)
      Seq(7L, 123L, 401L)
        .map(k => Snapshot.readWhere(s, base, EqualTo("doc_id", k)))
        .reduce(_.unionByName(_))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // §2.1 (round 14) — GOLDEN-RECORD survivorship merge (the MDM
    // "merge/purge" endgame): record linkage (q227/q230/q245) decides
    // WHICH records co-refer; survivorship decides what the merged
    // entity SAYS. Three planted source systems emit conflicting
    // records per customer (A = the master, B = a CRM overlay with
    // upper-cased names and stale balances, C = a billing feed with
    // corrected balances but no names); rules: per field take the
    // MOST RECENT NON-NULL value (argmax over (nn_upd, value) structs
    // — no window), money as exact DECIMAL(18,2) cents end to end,
    // and a per-entity conflict census (fields with >1 distinct
    // non-null value). ONE groupBy on the entity key — survivorship
    // is a partial-agg, never a sort; at 100 TB the union arrives as
    // source partitions and the merge is one shuffle on the key.
    "q248_golden_record" -> { (s, d) =>
      val a = Tables.customer(s, d).select(col("c_custkey").as("k"),
        lit(1L).as("upd"), col("c_name").as("name"),
        col("c_acctbal").cast(DecimalType(18, 2)).as("bal"),
        col("c_mktsegment").as("seg"))
      val b = Tables.customer(s, d).filter(col("c_custkey") % 4 === 0)
        .select(col("c_custkey").as("k"), lit(2L).as("upd"),
          upper(col("c_name")).as("name"),
          (col("c_acctbal").cast(DecimalType(18, 2)) +
            expr("CAST(10.00 AS DECIMAL(18,2))")).as("bal"),
          lit(null).cast("string").as("seg"))
      val c = Tables.customer(s, d).filter(col("c_custkey") % 8 === 0)
        .select(col("c_custkey").as("k"), lit(3L).as("upd"),
          lit(null).cast("string").as("name"),
          (col("c_acctbal").cast(DecimalType(18, 2)) -
            expr("CAST(5.25 AS DECIMAL(18,2))")).as("bal"),
          col("c_mktsegment").as("seg"))
      a.unionByName(b).unionByName(c)
        .groupBy(col("k"))
        .agg(
          max(struct(when(col("name").isNotNull, col("upd"))
            .otherwise(-1L).as("u"), col("name").as("v"))).as("mn"),
          max(struct(col("upd").as("u"), col("bal").as("v"))).as("mb"),
          max(struct(when(col("seg").isNotNull, col("upd"))
            .otherwise(-1L).as("u"), col("seg").as("v"))).as("ms"),
          count(lit(1)).as("n_records"),
          countDistinct(col("name")).as("cd_name"),
          countDistinct(col("bal")).as("cd_bal"),
          countDistinct(col("seg")).as("cd_seg"))
        .select(col("k"), col("mn")("v").as("golden_name"),
          col("mb")("v").cast("double").as("golden_bal"),
          col("ms")("v").as("golden_seg"), col("n_records"),
          ((col("cd_name") > 1).cast("int") + (col("cd_bal") > 1).cast("int")
            + (col("cd_seg") > 1).cast("int")).as("n_conflicts"))
        .orderBy(col("k"))
    },

    // §2.3 (round 14) — BENFORD first-digit audit (Newcomb 1881 /
    // Benford '38; the forensic-accounting screen — fabricated or
    // unit-mangled numeric feeds drift from the log distribution long
    // before totals look wrong): exact cents (the money discipline)
    // render to a BIGINT string — integer formatting is engine-
    // identical, unlike double formatting — and the first character
    // is the first significant digit (×100 preserves it). Per digit:
    // count, observed share, the Benford expectation log10(1 + 1/d),
    // delta, and the digit's chi-square contribution. One narrow scan
    // + one 9-row groupBy.
    "q259_benford" -> { (s, d) =>
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val digits = Tables.orders(s, d)
        .filter(col("o_totalprice") > 0)
        .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("total"))
      digits.crossJoin(broadcast(tot))
        // ln-ratio form, textually mirrored in the oracle — engines'
        // dedicated log10 and change-of-base log can differ in ulp
        .withColumn("p_benford", expr("ln(1.0 + 1.0 / digit) / ln(10.0)"))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("total"), 6).as("share"),
          round(col("p_benford"), 6).as("benford_share"),
          round(col("n").cast("double") / col("total") - col("p_benford"), 6)
            .as("delta"),
          round(pow(col("n").cast("double") - col("total") * col("p_benford"), 2.0)
            / (col("total") * col("p_benford")), 6).as("chi2_part"))
        .orderBy(col("digit"))
    },

    // §2.3 (round 14) — MANN–WHITNEY U rank-sum test per source vs
    // rest (Wilcoxon '45 / Mann & Whitney '47; the NONPARAMETRIC
    // companion to q254's Welch t — the right test when lengths are
    // skewed, which corpus lengths always are). The classic blocker
    // at scale is the global rank sort; here ranks derive from the
    // BOUNDED VALUE DOMAIN instead: per distinct value, DOUBLED
    // midrank R2(v) = 2·|{x < v}| + m_v + 1 is an exact integer from
    // a domain-sized cumulative window (aggregate beneath — the
    // plan-audit bounded rule), so no corpus row ever sorts. Per
    // source: U from exact integer rank sums, tie-corrected normal
    // z via textually identical IEEE chains (the q254 contract).
    "q260_mann_whitney" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      val vc = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
        .scopedPersist() // consumers: domain totals + per-source sums
      val dom = vc.groupBy(col("v")).agg(sum(col("c")).as("m"))
        .withColumn("cumBefore",
          coalesce(sum(col("m")).over(Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("v"), col("m"),
          (lit(2L) * col("cumBefore") + col("m") + 1L).as("r2"))
      // tie term m³ and the doubled rank-sum Σ c·r2 grow ~n²/n³ —
      // DECIMAL(38,0) headroom to 10³⁸ (a Long wraps silently at
      // ~2.1M-row value bins / ~3·10⁹ corpus rows); the oracle
      // mirrors with the FACTOR cast to HUGEINT (DuckDB's per-row
      // BIGINT product would out-of-range at the same ~2.1M bins
      // the decimal promotion exists to survive — headroom must be
      // two-sided, not Spark-only)
      val ties = dom.agg(
        sum(col("m").cast(DecimalType(38, 0)) * col("m") * col("m")
          - col("m")).as("tsum"),
        sum(col("m")).as("nn"))
      val per = vc.join(dom.select(col("v"), col("r2")), "v")
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_s"),
          sum(col("c").cast(DecimalType(38, 0)) * col("r2")).as("r2_s"))
      per.crossJoin(broadcast(ties))
        .withColumn("n_r", col("nn") - col("n_s"))
        .withColumn("u", expr("CAST(r2_s - n_s * (n_s + 1) AS DOUBLE) / 2"))
        .withColumn("mu", expr("CAST(n_s AS DOUBLE) * n_r / 2"))
        .withColumn("sig2", expr(
          "CAST(n_s AS DOUBLE) * n_r / 12 * ((nn + 1) " +
            "- CAST(tsum AS DOUBLE) / (nn * (nn - 1)))"))
        .select(col("source"), col("n_s"),
          col("u").as("u_stat"),
          round(expr("(u - mu) / sqrt(sig2)"), 6).as("z"))
        .orderBy(col("source"))
    },

    // §2.3 (round 14) — WELCH two-sample t-test per source vs rest
    // (Welch '47, the unequal-variance test every A/B framework
    // defaults to): "is this source's length distribution different
    // from the rest of the corpus?" — the significance companion to
    // the q54/q143 profiling family (chi-square q146 answers it for
    // categorical splits; this is the continuous version). Moments
    // are EXACT integer sums (Σx, Σx² of n_chars), the rest-of-corpus
    // side derives by subtraction from the 1-row totals broadcast (no
    // second scan — q251's LOO identity), and the t statistic +
    // Welch–Satterthwaite df evaluate through textually identical
    // formula chains in both engines. ONE partial-agg groupBy.
    "q254_welch_ttest" -> { (s, d) =>
      val per = Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_s"),
          sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
      val tot = per.agg(sum(col("n_s")).as("n"), sum(col("sx")).as("tsx"),
        sum(col("sxx")).as("tsxx"))
      per.crossJoin(broadcast(tot))
        .withColumn("m1", expr("CAST(sx AS DOUBLE) / n_s"))
        .withColumn("m2", expr("CAST(tsx - sx AS DOUBLE) / (n - n_s)"))
        .withColumn("v1", expr("(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)" +
          " * CAST(sx AS DOUBLE) / n_s) / (n_s - 1)"))
        .withColumn("v2", expr("(CAST(tsxx - sxx AS DOUBLE)" +
          " - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE)" +
          " / (n - n_s)) / (n - n_s - 1)"))
        .withColumn("se", expr("v1 / n_s + v2 / (n - n_s)"))
        .select(col("source"), col("n_s").as("n_docs"),
          round(col("m1"), 6).as("mean_s"),
          round(col("m2"), 6).as("mean_rest"),
          expr("ROUND((m1 - m2) / sqrt(se), 6)").as("t_stat"),
          expr("ROUND(se * se / ((v1 / n_s) * (v1 / n_s) / (n_s - 1)" +
            " + (v2 / (n - n_s)) * (v2 / (n - n_s)) / (n - n_s - 1)), 6)")
            .as("df"))
        .orderBy(col("source"))
    }
  )

  val oracleSql: Map[String, String] = Map(

    "q259_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100, 0)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM orders WHERE o_totalprice > 0),
        |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
        |SELECT digit, n,
        |  ROUND(CAST(n AS DOUBLE) / total, 6) AS share,
        |  ROUND(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_share,
        |  ROUND(CAST(n AS DOUBLE) / total
        |    - ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS delta,
        |  ROUND(pow(CAST(n AS DOUBLE)
        |      - total * (ln(1.0 + 1.0 / digit) / ln(10.0)), 2.0)
        |    / (total * (ln(1.0 + 1.0 / digit) / ln(10.0))), 6) AS chi2_part
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin,

    "q260_mann_whitney" ->
      """WITH vc AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY source, n_chars),
        |dom0 AS (SELECT v, CAST(SUM(c) AS BIGINT) AS m FROM vc GROUP BY v),
        |dom AS (SELECT v, m,
        |    COALESCE(SUM(m) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM dom0),
        |dom2 AS (SELECT v, m, 2 * cb + m + 1 AS r2 FROM dom),
        |ties AS (SELECT CAST(SUM(CAST(m AS HUGEINT) * m * m - m) AS DECIMAL(38,0)) AS tsum,
        |         CAST(SUM(m) AS BIGINT) AS nn FROM dom2),
        |per AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s,
        |        CAST(SUM(CAST(c AS HUGEINT) * r2) AS DECIMAL(38,0)) AS r2_s
        |  FROM vc JOIN dom2 USING (v) GROUP BY source),
        |b AS (SELECT source, n_s, nn - n_s AS n_r, r2_s, tsum, nn
        |      FROM per CROSS JOIN ties),
        |b2 AS (SELECT source, n_s,
        |    CAST(r2_s - n_s * (n_s + 1) AS DOUBLE) / 2 AS u,
        |    CAST(n_s AS DOUBLE) * n_r / 2 AS mu,
        |    CAST(n_s AS DOUBLE) * n_r / 12 * ((nn + 1)
        |      - CAST(tsum AS DOUBLE) / (nn * (nn - 1))) AS sig2
        |  FROM b)
        |SELECT source, n_s, u AS u_stat, ROUND((u - mu) / sqrt(sig2), 6) AS z
        |FROM b2 ORDER BY source""".stripMargin,

    "q254_welch_ttest" ->
      """WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx,
        |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n,
        |    CAST(SUM(sx) AS BIGINT) AS tsx,
        |    CAST(SUM(sxx) AS BIGINT) AS tsxx FROM per),
        |b AS (SELECT source, n_s, n,
        |    CAST(sx AS DOUBLE) / n_s AS m1,
        |    CAST(tsx - sx AS DOUBLE) / (n - n_s) AS m2,
        |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |      / n_s) / (n_s - 1) AS v1,
        |    (CAST(tsxx - sxx AS DOUBLE) - CAST(tsx - sx AS DOUBLE)
        |      * CAST(tsx - sx AS DOUBLE) / (n - n_s)) / (n - n_s - 1) AS v2
        |  FROM per CROSS JOIN tot),
        |b2 AS (SELECT *, v1 / n_s + v2 / (n - n_s) AS se FROM b)
        |SELECT source, n_s AS n_docs, ROUND(m1, 6) AS mean_s,
        |  ROUND(m2, 6) AS mean_rest,
        |  ROUND((m1 - m2) / sqrt(se), 6) AS t_stat,
        |  ROUND(se * se / ((v1 / n_s) * (v1 / n_s) / (n_s - 1)
        |    + (v2 / (n - n_s)) * (v2 / (n - n_s)) / (n - n_s - 1)), 6) AS df
        |FROM b2 ORDER BY source""".stripMargin,

    "q248_golden_record" ->
      """WITH recs AS (
        |  SELECT c_custkey AS k, 1 AS upd, c_name AS name,
        |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal, c_mktsegment AS seg
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 2, upper(c_name),
        |    CAST(c_acctbal AS DECIMAL(18,2)) + CAST(10.00 AS DECIMAL(18,2)),
        |    NULL FROM customer WHERE c_custkey % 4 = 0
        |  UNION ALL
        |  SELECT c_custkey, 3, NULL,
        |    CAST(c_acctbal AS DECIMAL(18,2)) - CAST(5.25 AS DECIMAL(18,2)),
        |    c_mktsegment FROM customer WHERE c_custkey % 8 = 0),
        |g AS (SELECT k,
        |  MAX(CASE WHEN name IS NOT NULL THEN upd ELSE -1 END) AS un,
        |  MAX(upd) AS ub,
        |  MAX(CASE WHEN seg IS NOT NULL THEN upd ELSE -1 END) AS us,
        |  CAST(COUNT(*) AS BIGINT) AS n_records,
        |  COUNT(DISTINCT name) AS cd_name,
        |  COUNT(DISTINCT bal) AS cd_bal,
        |  COUNT(DISTINCT seg) AS cd_seg
        |  FROM recs GROUP BY k)
        |SELECT g.k, rn.name AS golden_name,
        |  CAST(rb.bal AS DOUBLE) AS golden_bal,
        |  rs.seg AS golden_seg, g.n_records,
        |  (CASE WHEN cd_name > 1 THEN 1 ELSE 0 END
        |   + CASE WHEN cd_bal > 1 THEN 1 ELSE 0 END
        |   + CASE WHEN cd_seg > 1 THEN 1 ELSE 0 END) AS n_conflicts
        |FROM g
        |JOIN recs rn ON rn.k = g.k AND rn.upd = g.un
        |JOIN recs rb ON rb.k = g.k AND rb.upd = g.ub
        |JOIN recs rs ON rs.k = g.k AND rs.upd = g.us
        |ORDER BY g.k""".stripMargin,

    // PageRank, 5 unrolled iterations as chained CTEs — no recursive
    // aggregation needed, and bit-exact against the Spark side because
    // per-edge contributions quantize to DECIMAL(28,14) before each
    // order-independent decimal SUM. (1.0 - 0.85) is written as the
    // SUBTRACTION so both engines evaluate the same IEEE expression
    // the Scala side computes for lit(1.0 - damping).
    "q91_pagerank" -> {
      val iterCtes = (1 to 5).map { i =>
        s"""r$i AS (
           |  SELECT n.id, (1.0 - 0.85) + 0.85 * COALESCE(CAST(s.contrib AS DOUBLE), 0.0) AS rank
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS id, SUM(CAST(p.rank / od.o AS DECIMAL(28,14))) AS contrib
           |    FROM e JOIN r${i - 1} p ON e.src = p.id JOIN od ON e.src = od.src
           |    GROUP BY e.dst) s ON n.id = s.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT o_custkey % 200 AS src, o_orderkey % 200 AS dst
         |  FROM orders WHERE o_custkey % 200 <> o_orderkey % 200),
         |n AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
         |od AS (SELECT src, COUNT(*) AS o FROM e GROUP BY src),
         |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM n),
         |$iterCtes
         |SELECT id, ROUND(rank, 6) AS rank FROM r5 ORDER BY id""".stripMargin
    },

    "q51_range_join" ->
      """SELECT a.user_id AS user_id, COUNT(*) AS n_close_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
        |GROUP BY a.user_id
        |ORDER BY user_id""".stripMargin,

    "q52_train_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2')
        |       THEN 'holdout' ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q53_median" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS median_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q106_expectations" ->
      """SELECT "constraint", n_violations, n_violations = 0 AS pass FROM (
        |  SELECT 'l_quantity_in_1_50' AS "constraint",
        |    CAST(COALESCE(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice_positive',
        |    CAST(COALESCE(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount_in_0_0.1',
        |    CAST(COALESCE(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate_nonnull',
        |    CAST(COALESCE(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'o_orderkey_unique',
        |    CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
        |  UNION ALL
        |  SELECT 'l_orderkey_fk',
        |    CAST(COUNT(*) AS BIGINT) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |) t
        |ORDER BY "constraint"""".stripMargin,

    "q57_upsert_merge" ->
      """WITH updates AS (
        |  SELECT c_custkey, c_name,
        |    CAST(round(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,2)), 2) AS DOUBLE) AS c_acctbal
        |  FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT 1000000 + i AS c_custkey, 'NewCustomer#' || i AS c_name,
        |         0.0 AS c_acctbal
        |  FROM (SELECT unnest(generate_series(1, 3)) AS i))
        |SELECT COALESCE(c.c_custkey, u.c_custkey) AS c_custkey,
        |       COALESCE(u.c_name, c.c_name) AS c_name,
        |       COALESCE(u.c_acctbal, c.c_acctbal) AS c_acctbal
        |FROM customer c
        |FULL OUTER JOIN updates u ON c.c_custkey = u.c_custkey
        |ORDER BY c_custkey""".stripMargin,

    // identical feed plants, window resolution, and join arithmetic
    "q168_cdc_apply" ->
      """WITH feed AS (
        |  SELECT c_custkey, 'U' AS op, 1 AS seq, c_name AS f_name,
        |    CAST(round(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,2)), 2) AS DOUBLE) AS f_bal
        |  FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT c_custkey, 'D' AS op, 2 AS seq, NULL AS f_name, NULL AS f_bal
        |  FROM customer WHERE c_custkey % 10 = 3
        |  UNION ALL
        |  SELECT 2000000 + i AS c_custkey, 'I' AS op, 1 AS seq,
        |    'Inserted#' || i AS f_name, 100.0 AS f_bal
        |  FROM (SELECT unnest(generate_series(1, 3)) AS i)),
        |latest AS (
        |  SELECT c_custkey, op, f_name, f_bal FROM (
        |    SELECT feed.*, row_number() OVER (PARTITION BY c_custkey
        |      ORDER BY seq DESC, op) AS rn FROM feed)
        |  WHERE rn = 1)
        |SELECT COALESCE(c.c_custkey, l.c_custkey) AS c_custkey,
        |  COALESCE(l.f_name, c.c_name) AS c_name,
        |  COALESCE(l.f_bal, c.c_acctbal) AS c_acctbal
        |FROM customer c
        |FULL OUTER JOIN latest l ON c.c_custkey = l.c_custkey
        |WHERE l.op IS NULL OR l.op <> 'D'
        |ORDER BY c_custkey""".stripMargin,

    // capacity (256) exceeds the corpus vocabulary, so the sketch is
    // exact here and the oracle can check it against a plain top-10.
    "q56_heavy_hitters" ->
      """SELECT lang, rank, token, est_count FROM (
        |  SELECT lang, w AS token, COUNT(*) AS est_count,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY COUNT(*) DESC, w) AS rank
        |  FROM (SELECT lang,
        |          unnest(list_filter(string_split(
        |            regexp_replace(lower(text),'[^a-z0-9 ]','','g'),' '),
        |            x -> x <> '')) AS w
        |        FROM documents)
        |  GROUP BY lang, w)
        |WHERE rank <= 10
        |ORDER BY lang, rank""".stripMargin,

    "q55_cube" ->
      """SELECT n_name, c_mktsegment, COUNT(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, c_mktsegment)
        |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    "q54_profile" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(c_name IS NULL AS BIGINT)) AS BIGINT) AS null_name,
        |  COUNT(DISTINCT c_mktsegment) AS distinct_segments,
        |  COUNT(DISTINCT c_nationkey) AS distinct_nations,
        |  CAST(ROUND(MIN(c_acctbal) * 100, 0) AS BIGINT) AS min_bal_cents,
        |  CAST(ROUND(MAX(c_acctbal) * 100, 0) AS BIGINT) AS max_bal_cents
        |FROM customer""".stripMargin,

    "q90_scd2" ->
      """SELECT o_custkey, o_orderkey,
        |  epoch_us(o_orderdate) AS valid_from_us,
        |  lead(epoch_us(o_orderdate)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to_us,
        |  CAST(CASE WHEN lead(epoch_us(o_orderdate)) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM orders
        |ORDER BY o_custkey, valid_from_us, o_orderkey""".stripMargin,

    "q99_vector_profile" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS n_dims,
        |  CAST(embedding[1] AS DOUBLE) AS first_val,
        |  CAST(embedding[33] AS DOUBLE) AS mid_val,
        |  CAST(list_min(embedding) AS DOUBLE) AS min_val,
        |  CAST(list_max(embedding) AS DOUBLE) AS max_val
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q100_snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey,
        |    CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS old_cents
        |  FROM orders WHERE o_orderkey % 10 <> 3
        |), neu AS (
        |  SELECT o_orderkey,
        |    CAST(ROUND((CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1
        |                     ELSE o_totalprice END) * 100, 0) AS BIGINT) AS new_cents
        |  FROM orders WHERE o_orderkey % 10 <> 7
        |)
        |SELECT COALESCE(old.o_orderkey, neu.o_orderkey) AS o_orderkey,
        |  old_cents, new_cents,
        |  CASE WHEN old_cents IS NULL THEN 'insert'
        |       WHEN new_cents IS NULL THEN 'delete'
        |       WHEN old_cents <> new_cents THEN 'update'
        |       ELSE 'unchanged' END AS change_type
        |FROM old FULL OUTER JOIN neu ON old.o_orderkey = neu.o_orderkey
        |WHERE CASE WHEN old_cents IS NULL THEN 'insert'
        |           WHEN new_cents IS NULL THEN 'delete'
        |           WHEN old_cents <> new_cents THEN 'update'
        |           ELSE 'unchanged' END <> 'unchanged'
        |ORDER BY o_orderkey""".stripMargin,

    // the plain (unsalted) join — salting must be result-invisible
    "q111_salted_join" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0
        |              ELSE l_orderkey % 100 END AS hot_key, l_quantity
        |  FROM lineitem),
        |dim AS (SELECT i AS hot_key, i % 7 AS bucket7
        |        FROM (SELECT unnest(generate_series(0, 99)) AS i))
        |SELECT bucket7, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM li JOIN dim USING (hot_key)
        |GROUP BY bucket7 ORDER BY bucket7""".stripMargin,

    "q122_embed_truncate" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_sum(list_transform(embedding[1:16],
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS e16,
        |    list_sum(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS e64
        |  FROM embeddings)
        |SELECT vec_id,
        |  ROUND(sqrt(e16), 6) AS norm16,
        |  ROUND(sqrt(e64), 6) AS norm64,
        |  ROUND(e16 / e64, 6) AS energy_retained,
        |  ROUND(sqrt(e16 / e64), 6) AS cos_trunc_full
        |FROM e ORDER BY vec_id""".stripMargin,

    // the oracle recomputes from ALL facts in one scan — a hash match
    // proves the incremental base ⊕ delta merge is exact
    "q135_incremental_agg" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  epoch_us(MAX(o_orderdate)) AS last_order_us
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q142_embed_outliers" ->
      """WITH x AS (
        |  SELECT vec_id, label,
        |    unnest([{'d': i - 1, 'v': embedding[i]}
        |            for i in generate_series(1, len(embedding))]) AS u
        |  FROM embeddings),
        |p AS (SELECT vec_id, label, CAST(u.d AS BIGINT) AS dim,
        |        CAST(u.v AS DOUBLE) AS v
        |      FROM x),
        |c AS (SELECT label, dim,
        |        CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
        |      FROM p GROUP BY label, dim),
        |sq AS (SELECT p.vec_id, p.label,
        |         CAST((p.v - c.c) * (p.v - c.c) AS DECIMAL(28,12)) AS sq
        |       FROM p JOIN c ON p.label = c.label AND p.dim = c.dim),
        |d AS (SELECT vec_id, label, ROUND(sqrt(CAST(SUM(sq) AS DOUBLE)), 6) AS dist
        |      FROM sq GROUP BY vec_id, label),
        |t AS (SELECT label, ROUND(quantile_cont(dist, 0.95), 6) AS p95
        |      FROM d GROUP BY label)
        |SELECT d.vec_id, d.label, d.dist, t.p95, d.dist > t.p95 AS is_outlier
        |FROM d JOIN t ON d.label = t.label
        |ORDER BY d.vec_id""".stripMargin,

    "q134_group_centroids" ->
      """WITH x AS (
        |  SELECT label,
        |    unnest([{'d': i - 1, 'v': embedding[i]}
        |            for i in generate_series(1, len(embedding))]) AS u
        |  FROM embeddings),
        |q AS (SELECT label, CAST(u.d AS BIGINT) AS dim,
        |        CAST(CAST(u.v AS DOUBLE) AS DECIMAL(28,12)) AS vq
        |      FROM x)
        |SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(CAST(SUM(vq) AS DOUBLE) / COUNT(*), 6) AS centroid
        |FROM q GROUP BY label, dim
        |ORDER BY label, dim""".stripMargin,

    "q123_psi_drift" ->
      """WITH b AS (
        |  SELECT LEAST(4, CAST(FLOOR(n_chars / 100) AS BIGINT)) AS bin,
        |         doc_id % 2 = 0 AS is_ref
        |  FROM documents),
        |a AS (
        |  SELECT bin,
        |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_live
        |  FROM b GROUP BY bin),
        |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
        |             CAST(SUM(n_live) AS BIGINT) AS t_live FROM a)
        |SELECT bin, n_ref, n_live,
        |  ROUND((n_ref + 1.0) / (t_ref + 5), 6) AS p_ref,
        |  ROUND((n_live + 1.0) / (t_live + 5), 6) AS p_live,
        |  ROUND(((n_live + 1.0) / (t_live + 5) - (n_ref + 1.0) / (t_ref + 5))
        |        * ln(((n_live + 1.0) / (t_live + 5)) / ((n_ref + 1.0) / (t_ref + 5))), 6)
        |    AS psi_term
        |FROM a CROSS JOIN t ORDER BY bin""".stripMargin,

    "q187_skew_advisor" ->
      """WITH keyed AS (
        |  SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 0
        |              ELSE l_orderkey % 100 END AS hot_key
        |  FROM lineitem),
        |bykey AS (SELECT hot_key, COUNT(*) AS cnt FROM keyed GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total,
        |               CAST(COUNT(*) AS BIGINT) AS n_keys FROM bykey),
        |r AS (SELECT hot_key, cnt, total, n_keys,
        |        CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, hot_key) AS INT) AS rank
        |      FROM bykey CROSS JOIN tot)
        |SELECT rank, hot_key, cnt,
        |  ROUND(cnt / total, 6) AS share,
        |  ROUND((cnt * n_keys) / total, 6) AS skew_factor,
        |  CAST(CEIL((cnt * n_keys) / total) AS BIGINT) AS recommended_salt
        |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "q121_pseudonymize" ->
      """SELECT sha256('graft-salt-v1:' || CAST(o_custkey AS VARCHAR)) AS pseud,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY 1 ORDER BY pseud""".stripMargin,

    // k-NN label noise: identical ranked-neighbor construction to the
    // q34 oracle (round(.,6) cosine, vec_id tie-break), then the vote
    // argmax with ties to the smaller label
    "q193_knn_label_noise" ->
      """WITH sl AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        |            FROM embeddings WHERE vec_id < 300),
        |nb AS (
        |  SELECT q.vec_id, q.label, c.label AS n_label,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY round(list_cosine_similarity(q.e, c.e), 6) DESC,
        |               c.vec_id) AS rn
        |  FROM sl q JOIN sl c ON c.vec_id <> q.vec_id),
        |k AS (SELECT vec_id, label, n_label FROM nb WHERE rn <= 5),
        |v AS (SELECT vec_id, label, n_label, COUNT(*) AS cnt
        |      FROM k GROUP BY 1, 2, 3),
        |w AS (SELECT vec_id, label, n_label AS knn_label,
        |        CAST(cnt AS BIGINT) AS n_votes,
        |        row_number() OVER (PARTITION BY vec_id
        |          ORDER BY cnt DESC, n_label) AS vr
        |      FROM v),
        |a AS (SELECT vec_id,
        |        CAST(COALESCE(SUM(CASE WHEN n_label = label THEN cnt END), 0)
        |          AS BIGINT) AS n_agree
        |      FROM v GROUP BY vec_id)
        |SELECT w.vec_id, w.label, w.knn_label, w.n_votes, a.n_agree,
        |  w.knn_label <> w.label AS suspect
        |FROM w JOIN a ON a.vec_id = w.vec_id
        |WHERE w.vr = 1 ORDER BY w.vec_id""".stripMargin,

    // identical per-table typed-width estimates; integer sums, one
    // exact ratio against the 10 MiB threshold
    "q202_join_advisor" -> {
      def t(name: String, role: String, width: String): String =
        s"""SELECT '$name' AS table_name, '$role' AS role,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM($width) AS BIGINT) AS est_bytes,
           |  CASE WHEN '$role' = 'dim' AND SUM($width) <= 10485760
           |       THEN 'BROADCAST' ELSE 'SHUFFLE' END AS advice,
           |  ROUND(CAST(SUM($width) AS DOUBLE) / CAST(10485760.0 AS DOUBLE), 6)
           |    AS threshold_ratio
           |FROM $name""".stripMargin
      Seq(
        t("region", "dim", "4 + strlen(r_name) + 4"),
        t("nation", "dim", "8 + strlen(n_name) + 4"),
        t("customer", "dim",
          "20 + strlen(c_name) + 4 + strlen(c_mktsegment) + 4"),
        t("supplier", "dim", "20 + strlen(s_name) + 4"),
        t("part", "dim",
          "20 + strlen(p_name) + 4 + strlen(p_brand) + 4 + strlen(p_type) + 4"),
        t("orders", "fact",
          "32 + strlen(o_orderstatus) + 4 + strlen(o_orderpriority) + 4"),
        t("lineitem", "fact",
          "68 + strlen(l_returnflag) + 4 + strlen(l_linestatus) + 4"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },

    // bit-arithmetic mirror of ZOrderOps.interleave over the same
    // exact-integer 16-bit normalization (floor div on nonnegative
    // ranges ≡ decimal `div`): a's bits land at even positions, b's
    // at odd — list_sum over the 16 bit lanes.
    // stats-pruned snapshot read: the engine side goes through the
    // z-ordered generation + footer-stats file pruning; the oracle is
    // the PLAIN filtered scan — equality proves pruning lossless
    "q212_pruned_read" ->
      """SELECT CAST(o_day // 91 AS BIGINT) AS qtr,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        |  CAST(MIN(o_orderkey) AS BIGINT) AS min_okey,
        |  CAST(MAX(o_orderkey) AS BIGINT) AS max_okey
        |FROM (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS o_day,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders)
        |WHERE o_custkey BETWEEN 10 AND 60 AND o_day BETWEEN 365 AND 1095
        |GROUP BY qtr ORDER BY qtr""".stripMargin,

    "q208_zorder_tiles" ->
      """WITH b AS (
        |  SELECT min(o_custkey) AS mna, max(o_custkey) AS mxa,
        |    min(CAST(o_orderdate AS DATE) - DATE '1992-01-01') AS mnb,
        |    max(CAST(o_orderdate AS DATE) - DATE '1992-01-01') AS mxb
        |  FROM orders),
        |n AS (
        |  SELECT o_custkey AS ck,
        |    CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS dy,
        |    CASE WHEN b.mxa = b.mna THEN 0
        |         ELSE (o_custkey - b.mna) * 65535 // (b.mxa - b.mna) END AS na,
        |    CASE WHEN b.mxb = b.mnb THEN 0
        |         ELSE ((CAST(o_orderdate AS DATE) - DATE '1992-01-01') - b.mnb)
        |              * 65535 // (b.mxb - b.mnb) END AS nb
        |  FROM orders, b),
        |z AS (
        |  SELECT ck, dy,
        |    CAST(list_sum([ (((na >> i) & 1) << (2 * i))
        |                    + (((nb >> i) & 1) << (2 * i + 1))
        |                    FOR i IN generate_series(0, 15) ]) AS BIGINT) AS zv
        |  FROM n)
        |SELECT zv >> 26 AS tile, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  min(zv) AS z_min, max(zv) AS z_max,
        |  CAST(min(ck) AS BIGINT) AS ck_min, CAST(max(ck) AS BIGINT) AS ck_max,
        |  CAST(min(dy) AS BIGINT) AS day_min, CAST(max(dy) AS BIGINT) AS day_max
        |FROM z GROUP BY tile ORDER BY tile""".stripMargin,

    "q221_compaction_plan" ->
      """WITH ledger AS (
        |  SELECT l_orderkey % 97 AS shard,
        |    CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS f_bytes,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM lineitem GROUP BY shard),
        |tot AS (SELECT CAST(SUM(f_bytes) AS BIGINT) AS total FROM ledger),
        |placed AS (
        |  SELECT shard, f_bytes, n_rows,
        |    (tot.total // 12) + 1 AS target,
        |    COALESCE(SUM(f_bytes) OVER (ORDER BY f_bytes DESC, shard
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |  FROM ledger, tot),
        |bins AS (SELECT shard, f_bytes, n_rows,
        |           CAST(prev // target AS BIGINT) AS bin FROM placed)
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_files,
        |  CAST(SUM(f_bytes) AS BIGINT) AS bin_bytes,
        |  CAST(SUM(n_rows) AS BIGINT) AS bin_rows,
        |  min(shard) AS min_shard, max(shard) AS max_shard,
        |  ROUND(CAST(MAX(f_bytes) AS DOUBLE) / MIN(f_bytes), 6) AS skew
        |FROM bins GROUP BY bin ORDER BY bin""".stripMargin,

    // the PLAIN join — the Bloom pre-filter must be invisible in the
    // result (no false negatives; FPs removed by the join)
    "q228_bloom_semijoin" ->
      """WITH dim AS (
        |  SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0)
        |SELECT o_year,
        |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem JOIN dim ON l_orderkey = o_orderkey
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q231_analyze_stats" ->
      """WITH ck AS (
        |  SELECT 'o_custkey' AS col_name,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv,
        |    ROUND(CAST(MIN(o_custkey) AS DOUBLE), 6) AS min_num,
        |    ROUND(CAST(MAX(o_custkey) AS DOUBLE), 6) AS max_num,
        |    ROUND(quantile_cont(o_custkey, 0.25), 6) AS q25,
        |    ROUND(quantile_cont(o_custkey, 0.5), 6) AS q50,
        |    ROUND(quantile_cont(o_custkey, 0.75), 6) AS q75,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
        |    CAST(NULL AS VARCHAR) AS mcv, CAST(NULL AS BIGINT) AS mcv_cnt
        |  FROM orders),
        |tp AS (
        |  SELECT 'o_totalprice' AS col_name,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS ndv,
        |    ROUND(CAST(MIN(o_totalprice) AS DOUBLE), 6) AS min_num,
        |    ROUND(CAST(MAX(o_totalprice) AS DOUBLE), 6) AS max_num,
        |    ROUND(quantile_cont(o_totalprice, 0.25), 6) AS q25,
        |    ROUND(quantile_cont(o_totalprice, 0.5), 6) AS q50,
        |    ROUND(quantile_cont(o_totalprice, 0.75), 6) AS q75,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
        |    CAST(NULL AS VARCHAR) AS mcv, CAST(NULL AS BIGINT) AS mcv_cnt
        |  FROM orders),
        |mc AS (
        |  SELECT o_orderpriority AS mcv, CAST(COUNT(*) AS BIGINT) AS mcv_cnt
        |  FROM orders GROUP BY o_orderpriority
        |  ORDER BY mcv_cnt DESC, mcv LIMIT 1),
        |op AS (
        |  SELECT 'o_orderpriority' AS col_name,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS ndv,
        |    CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
        |    CAST(NULL AS DOUBLE) AS q25, CAST(NULL AS DOUBLE) AS q50,
        |    CAST(NULL AS DOUBLE) AS q75,
        |    MIN(o_orderpriority) AS min_str, MAX(o_orderpriority) AS max_str,
        |    (SELECT mcv FROM mc) AS mcv, (SELECT mcv_cnt FROM mc) AS mcv_cnt
        |  FROM orders)
        |SELECT * FROM ck UNION ALL SELECT * FROM tp UNION ALL SELECT * FROM op
        |ORDER BY col_name""".stripMargin,

    "q232_rendezvous_reshard" ->
      """WITH h12 AS (
        |  SELECT d.doc_id, t.s, md5(concat_ws('#', d.doc_id, t.s)) AS h
        |  FROM documents d, generate_series(0, 11) AS t(s)),
        |a12 AS (
        |  SELECT doc_id, s AS old_shard FROM (
        |    SELECT doc_id, s,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY h DESC) AS rn
        |    FROM h12) WHERE rn = 1),
        |h16 AS (
        |  SELECT d.doc_id, t.s, md5(concat_ws('#', d.doc_id, t.s)) AS h
        |  FROM documents d, generate_series(0, 15) AS t(s)),
        |a16 AS (
        |  SELECT doc_id, s AS new_shard FROM (
        |    SELECT doc_id, s,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY h DESC) AS rn
        |    FROM h16) WHERE rn = 1)
        |SELECT CAST(old_shard AS INTEGER) AS old_shard,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN new_shard <> old_shard THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved,
        |  ROUND(CAST(SUM(CASE WHEN new_shard <> old_shard THEN 1 ELSE 0 END)
        |    AS DOUBLE) / COUNT(*), 6) AS frac_moved
        |FROM a12 JOIN a16 USING (doc_id)
        |GROUP BY old_shard ORDER BY old_shard""".stripMargin,

    // the bloom pre-prune must be invisible in the result (no false
    // negatives; survivors re-filtered by the row predicate)
    "q235_bloom_point_read" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents WHERE doc_id IN (7, 123, 401)
        |ORDER BY doc_id""".stripMargin
  )
}
