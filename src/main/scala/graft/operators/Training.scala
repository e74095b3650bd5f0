package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Caching.ScopedPersist

/** Distributed classifier TRAINING — full-batch gradient-descent
  * logistic regression over a fixed-width feature column, built from
  * DataFrame aggregates only (no MLlib, no driver-side data). This
  * closes the quality-classifier loop the engine already serves:
  * q164's hashing-trick featurizer produces the vectors, THIS trains
  * the weights, q115 scores with them, q154 calibrates, q155
  * evaluates.
  *
  * Scale shape per iteration: weights broadcast as a literal array
  * (d ≤ a few thousand — the hashing trick's point is that d is
  * FIXED and vocabulary-free); the gradient is one narrow projection
  * (σ(w·x) − y scales each feature) followed by a (dim)-keyed partial
  * aggregate — d rows out of any corpus size — collected to the
  * driver (d-bounded, the same bounded-collect contract as the BPE
  * merge table). K iterations = K scans of the persisted feature
  * frame; nothing driver-side scales with the corpus.
  *
  * Determinism: per-row gradient contributions are quantized to
  * DECIMAL(28,12) BEFORE the sum (the q74/q101 moment discipline), so
  * every iteration's gradient — and therefore the whole trajectory —
  * is bit-identical under any partitioning (pinned in
  * PartitionInvarianceSpec via q166).
  */
object Training {

  /** One sigmoid, shared by training and scoring. */
  private def sigmoid(z: org.apache.spark.sql.Column) =
    lit(1.0) / (lit(1.0) + exp(-z))

  /** Train on (features array<double> of fixed dim, label 0/1 int).
    * Returns (weights including bias at index d, per-iteration mean
    * log-loss). Features frame is scanned once per iteration —
    * persist it (the caller holds the handle so scoping stays theirs).
    */
  def logisticRegression(feats: DataFrame, featCol: String,
                         labelCol: String, dim: Int, iters: Int = 15,
                         lr: Double = 1.0): (Array[Double], Seq[Double]) = {
    val n = feats.count().toDouble
    require(n > 0, "empty training frame")
    var w = Array.fill(dim + 1)(0.0) // bias at index dim
    val losses = scala.collection.mutable.Buffer.empty[Double]
    (0 until iters).foreach { _ =>
      // one narrow pass: the codegen'd LogitContrib kernel computes
      // [f_j·err ..., err, loss] per row (z = ascending-index dot +
      // bias — the zip_with/aggregate fold order, collapsed from
      // three CodegenFallback higher-order lambdas into one call),
      // reduced by the exact-decimal vector aggregate — NO
      // dim-explode, no per-dim shuffle rows, d-bounded partial state
      val wb = array(w.map(lit).toIndexedSeq: _*) // weights ++ bias
      val contribVec = graft.functions.GraftFunctions.logitContrib(
        col(featCol), wb, col(labelCol).cast("int"))
      val row = feats
        .agg(graft.functions.DecimalVectorSum
          .vectorSum(contribVec, dim + 2).as("vs"))
        .select(col("vs.sums")).first().getSeq[Double](0)
      val grad = row.take(dim + 1).map(_ / n).toArray
      losses += row(dim + 1) / n
      w = w.zip(grad).map { case (wj, gj) => wj - lr * gj }
    }
    (w, losses.toSeq)
  }

  /** Score a feature frame with trained weights (bias at index dim). */
  def score(feats: DataFrame, featCol: String, w: Array[Double]): DataFrame = {
    val dim = w.length - 1
    val wArr = array(w.take(dim).map(lit): _*)
    val z = aggregate(
      zip_with(col(featCol), wArr, (f, wj) => f * wj),
      lit(0.0), (acc, x) => acc + x) + lit(w(dim))
    feats.withColumn("p", sigmoid(z))
  }

  /** The full pipeline over documents: q164's hashed features
    * (normalized signed bucket counts), n_chars ≥ `labelAt` as the
    * reference label (the q115/q154 convention), trained weights
    * emitted one row per dimension plus the loss trajectory tail.
    */
  def trainQualityClassifier(spark: SparkSession, docs: DataFrame,
                             idCol: String, textCol: String,
                             nCharsCol: String, dims: Int = 64,
                             labelAt: Int = 300, iters: Int = 12): DataFrame = {
    // featurization is ONE narrow codegen'd pass (HashedFeatureVec:
    // md5 bucket votes accumulated per row, normalized by token
    // count) — bit-identical to the explode + two-shuffled-groupBys
    // spelling it replaced (integer votes are order-free; the parity
    // is pinned in TrainingSpec), with ZERO featurization shuffles.
    // Empty docs drop, matching the explode path's group semantics.
    val feats = {
      import graft.Caching.FanOut
      docs
        .select(col(idCol).as("doc_id"), col(nCharsCol).as("n_chars"),
          graft.functions.GraftFunctions.normWords(col(textCol)).as("__ws"))
        // fan out iff the scan is under-parallel (round 17): the md5
        // featurization and every iteration's decimal gradient partial
        // otherwise run on the single split a one-row-group parquet
        // file produces; the gradient reduction is partition-invariant
        // (PartitionInvarianceSpec), and at scale this is a no-op
        .fanOutSmallScan()
        .filter(size(col("__ws")) > 0)
        .select(col("doc_id"),
          graft.functions.GraftFunctions.hashedFeatures(col("__ws"), dims)
            .as("features"),
          (col("n_chars") >= labelAt).cast("int").as("label"))
        .scopedPersist() // K training scans read this frame
    }
    val (w, losses) = logisticRegression(feats, "features", "label",
      dims, iters)
    import spark.implicits._
    w.zipWithIndex.map { case (wj, j) =>
      (j, BigDecimal(wj).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(losses.head).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(losses.last).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.toDF("dim", "weight", "loss_first", "loss_last")
  }
}
