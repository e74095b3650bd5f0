package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{DecimalVectorSum, GraftFunctions}

/** SURVEY §2.3 (round 9) — distributed PCA over an embedding column:
  * the dimensionality-reduction / whitening pass of an embedding
  * pipeline (compacting vectors before ANN indexing, Matryoshka-style
  * truncation decisions with PRINCIPAL axes instead of prefix axes,
  * outlier axes for drift audits).
  *
  * Scale shape: ONE corpus pass computes Σv and ΣvvT together — each
  * row emits its [[graft.functions.MomentVector]] (v ++ upper-tri
  * v·vT, d + d(d+1)/2 doubles) through the exact-decimal vector
  * aggregate, so the reduction state is d²-bounded and independent of
  * row count, and the sums are bit-identical under ANY partitioning
  * (the q166 gradient discipline). The d×d eigensolve happens on the
  * driver — d-bounded, the BPE-merge-table contract — via cyclic
  * Jacobi rotations (deterministic: fixed sweep order, fixed
  * convergence threshold). Projection is a narrow codegen-friendly
  * pass; the corpus never shuffles at any point.
  *
  * Eigenvector sign is fixed deterministically (largest-|loading|
  * component made positive, ties to the lowest index) so the model is
  * reproducible run to run.
  */
object Pca {

  final case class PcaModel(dim: Int, n: Long, mean: Array[Double],
                            eigenvalues: Array[Double],
                            components: Array[Array[Double]]) {
    def trace: Double = eigenvalues.sum
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors as rows), sorted by descending
    * eigenvalue (ties: ascending original index), signs fixed. */
  private[operators] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < 64 && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 → tan = 1
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val row = v(i).clone()
      // deterministic sign: largest-|x| entry positive, ties → lowest idx
      var best = 0
      var j = 1
      while (j < d) { if (math.abs(row(j)) > math.abs(row(best))) best = j; j += 1 }
      if (row(best) < 0) { var k = 0; while (k < d) { row(k) = -row(k); k += 1 } }
      row
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    val d = a.length
    var s = 0.0
    var i = 0
    while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
    s
  }

  /** Fit mean + covariance (population, /n) + eigenpairs in ONE
    * corpus pass. `dim` must match the vector width. */
  def fit(emb: DataFrame, vecCol: String, dim: Int): PcaModel = {
    import graft.Caching.FanOut
    val width = dim + dim * (dim + 1) / 2
    // project to the vector column, then fan out iff the scan is
    // under-parallel (round 17: the sf bench tables are one-row-group
    // parquet files = ONE split, so the d²-wide decimal moment partials
    // all ran on a single core — 2.3 s of the 2.5 s query). The decimal
    // reduction is partition-invariant by contract, so the fan-out
    // cannot move the result; at scale the scan already has more
    // splits than cores and this is a no-op.
    val r = emb.select(col(vecCol)).fanOutSmallScan()
      .agg(DecimalVectorSum.vectorSum(
        GraftFunctions.momentVector(col(vecCol)), width).as("m"))
      .select(col("m.n"), col("m.sums")).head()
    val n = r.getLong(0)
    require(n > 1, s"PCA needs > 1 row, got $n")
    val sums = r.getSeq[Double](1)
    val mean = Array.tabulate(dim)(i => sums(i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var p = dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = sums(p) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        p += 1; j += 1
      }
      i += 1
    }
    val (vals, vecs) = jacobiEigen(cov)
    PcaModel(dim, n, mean, vals, vecs)
  }

  /** Project onto the top-k components: adds array<double> `coords`
    * (length k). Components ride the plan as literal arrays — a
    * narrow pass, no join, no shuffle. */
  def project(emb: DataFrame, vecCol: String, model: PcaModel, k: Int): DataFrame = {
    val coords = array((0 until k).map { c =>
      val comp = model.components(c)
      // dot(v, e_c) - dot(mean, e_c): the mean shift is a scalar constant
      val shift = (0 until model.dim).map(j => model.mean(j) * comp(j)).sum
      aggregate(
        zip_with(col(vecCol),
          array(comp.map(lit): _*),
          (x, e) => x.cast("double") * e),
        lit(0.0), (acc, x) => acc + x) - lit(shift)
    }: _*)
    emb.withColumn("coords", coords)
  }

  /** The audit table a pipeline reads: one row per component —
    * eigenvalue (variance along the axis), explained ratio,
    * cumulative ratio, and the dominant input dimension with its
    * loading. Driver-built from the d-bounded model; deterministic. */
  def componentReport(spark: SparkSession, model: PcaModel, k: Int): DataFrame = {
    import spark.implicits._
    val tot = model.trace
    var cum = 0.0
    (0 until k).map { c =>
      val ev = model.eigenvalues(c)
      cum += ev
      val comp = model.components(c)
      val top = (0 until model.dim).maxBy(j => (math.abs(comp(j)), -j))
      (c, round6(ev), round6(ev / tot), round6(cum / tot), top, round6(comp(top)))
    }.toDF("component", "eigenvalue", "explained_ratio", "cum_ratio",
      "top_dim", "top_loading")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Persist the model as one long-format parquet table (kind, i, j,
    * value) — the index-lifecycle discipline (SURVEY §4 round 9): a
    * serving session projects against a TRAINED model without
    * retraining. d-bounded rows; doubles survive parquet bit-exactly,
    * so a loaded model projects identically to the in-session one
    * (pinned in PcaSpec). */
  def save(spark: SparkSession, model: PcaModel, dir: String): Unit = {
    import spark.implicits._
    val rows =
      Seq(("n", 0, 0, model.n.toDouble), ("dim", 0, 0, model.dim.toDouble)) ++
        model.mean.zipWithIndex.toSeq.map { case (v, i) => ("mean", i, 0, v) } ++
        model.eigenvalues.zipWithIndex.toSeq.map { case (v, i) => ("eval", i, 0, v) } ++
        model.components.zipWithIndex.toSeq.flatMap { case (row, i) =>
          row.zipWithIndex.toSeq.map { case (v, j) => ("comp", i, j, v) }
        }
    rows.toDF("kind", "i", "j", "value")
      .repartition(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a persisted model (the d²-bounded collect mirrors fit's
    * driver-side eigensolve contract). */
  def load(spark: SparkSession, dir: String): PcaModel = {
    val rows = spark.read.parquet(dir)
      .select("kind", "i", "j", "value").collect()
    def of(kind: String) = rows.filter(_.getString(0) == kind)
    val dim = of("dim").head.getDouble(3).toInt
    val n = of("n").head.getDouble(3).toLong
    val mean = Array.ofDim[Double](dim)
    of("mean").foreach(r => mean(r.getInt(1)) = r.getDouble(3))
    val evals = Array.ofDim[Double](dim)
    of("eval").foreach(r => evals(r.getInt(1)) = r.getDouble(3))
    val comps = Array.ofDim[Double](dim, dim)
    of("comp").foreach(r => comps(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
    PcaModel(dim, n, mean, evals, comps)
  }
}
