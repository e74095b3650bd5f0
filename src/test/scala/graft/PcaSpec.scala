package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Distributed PCA (q171): eigen identities on the real embeddings
  * table, planted-structure recovery, and the partitioning-invariance
  * bar (exact-decimal moment sums ⇒ bit-identical model). */
class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val dim = emb.select(size(col("embedding"))).head.getInt(0)
  private lazy val model = Pca.fit(emb, "embedding", dim)

  test("eigenvalues are non-negative, descending, and sum to the covariance trace") {
    val ev = model.eigenvalues
    assert(ev.forall(_ >= -1e-9))
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b - 1e-12 })
    // trace check: Σ eigenvalues == Σ per-dim variance (computed independently)
    val n = model.n.toDouble
    val diagSum = (0 until dim).map { j =>
      val c = emb.select(element_at(col("embedding"), j + 1).cast("double").as("x"))
        .agg(sum(col("x")).as("s"), sum(col("x") * col("x")).as("ss"))
        .head()
      c.getDouble(1) / n - math.pow(c.getDouble(0) / n, 2)
    }.sum
    assert(math.abs(model.trace - diagSum) / math.max(diagSum, 1e-12) < 1e-6,
      s"trace ${model.trace} vs diag-sum $diagSum")
  }

  test("components are orthonormal") {
    val d = model.dim
    for (a <- 0 until 4; b <- 0 until 4) {
      val dot = (0 until d).map(j => model.components(a)(j) * model.components(b)(j)).sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"<e$a, e$b> = $dot")
    }
  }

  test("projected sample variance along component c equals eigenvalue c") {
    val proj = Pca.project(emb, "embedding", model, 2)
      .select(element_at(col("coords"), 1).as("c0"),
        element_at(col("coords"), 2).as("c1"))
      .agg(sum(col("c0") * col("c0")).as("ss0"), sum(col("c0")).as("s0"),
        sum(col("c1") * col("c1")).as("ss1"), sum(col("c1")).as("s1"))
      .head()
    val n = model.n.toDouble
    val v0 = proj.getDouble(0) / n - math.pow(proj.getDouble(1) / n, 2)
    val v1 = proj.getDouble(2) / n - math.pow(proj.getDouble(3) / n, 2)
    assert(math.abs(v0 - model.eigenvalues(0)) / model.eigenvalues(0) < 1e-6)
    assert(math.abs(v1 - model.eigenvalues(1)) / model.eigenvalues(1) < 1e-6)
  }

  test("planted dominant direction is recovered by the first component") {
    // x_i = t_i * u + tiny noise, u = (3,4)/5; PC1 must align with u
    val u = Array(0.6, 0.8)
    val rows = (0 until 200).map { i =>
      val t = (i % 21 - 10).toDouble // spread -10..10
      val eps = ((i * 7919) % 13 - 6).toDouble / 1000.0
      (i.toLong, Array((t * u(0) + eps).toFloat, (t * u(1) - eps).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", 2)
    val cosine = math.abs(m.components(0)(0) * u(0) + m.components(0)(1) * u(1))
    assert(cosine > 0.999, s"PC1 ${m.components(0).toSeq} vs planted $u")
    assert(m.eigenvalues(0) > 100 * m.eigenvalues(1))
  }

  test("model is bit-identical under 1-vs-7 partitions (exact-decimal moments)") {
    val m1 = Pca.fit(emb.repartition(1), "embedding", dim)
    val m7 = Pca.fit(emb.repartition(7), "embedding", dim)
    assert(m1.mean.toSeq === m7.mean.toSeq)
    assert(m1.eigenvalues.toSeq === m7.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq === m7.components.map(_.toSeq).toSeq)
  }

  test("persisted model projects bit-identically to the in-session one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pca").toString
    Pca.save(spark, model, dir)
    val loaded = Pca.load(spark, dir)
    assert(loaded.n === model.n)
    assert(loaded.mean.toSeq === model.mean.toSeq)
    assert(loaded.eigenvalues.toSeq === model.eigenvalues.toSeq)
    assert(loaded.components.map(_.toSeq).toSeq ===
      model.components.map(_.toSeq).toSeq)
    val a = Pca.project(emb, "embedding", model, 3)
      .select(col("vec_id"), col("coords")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Pca.project(emb, "embedding", loaded, 3)
      .select(col("vec_id"), col("coords")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a === b)
  }

  test("q171 report: 8 rows, ratios in [0,1], cum_ratio monotone") {
    val rep = SparkEntry.queries("q171_pca")(spark, sf).collect()
    assert(rep.length === 8)
    val cums = rep.map(_.getAs[Double]("cum_ratio")).toSeq
    assert(cums === cums.sorted)
    assert(rep.forall { r =>
      val x = r.getAs[Double]("explained_ratio"); x >= 0.0 && x <= 1.0
    })
  }
}
