package graft

import org.apache.spark.sql.functions._

import graft.operators.Training

/** Distributed logistic-regression training invariants: monotone
  * loss, separable-data accuracy, partitioning-invariant trajectory,
  * and the end-to-end quality-classifier pipeline shape.
  */
class TrainingSpec extends SparkSpecBase {
  import spark.implicits._

  // linearly separable toy set: label = (x0 > 0)
  private def separable(n: Int) = (1 to n).map { i =>
    val x0 = if (i % 2 == 0) 1.0 + (i % 7) * 0.1 else -1.0 - (i % 5) * 0.1
    val x1 = ((i * 31) % 11) / 11.0 - 0.5 // noise dim
    (i.toLong, Seq(x0, x1), if (x0 > 0) 1 else 0)
  }.toDF("doc_id", "features", "label")

  test("kernel featurization/contrib match the compositional spellings bit-exactly") {
    // featurization parity: HashedFeatureVec vs explode + groupBys
    val docs = Tables.documents(spark, sf).limit(50)
    val word = col("word")
    val bucket = (conv(substring(md5(word), 1, 8), 16, 10)
      .cast("long") % 16).cast("int")
    val sgn = when(conv(substring(md5(word), 9, 1), 16, 10)
      .cast("long") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))
    val composed = docs
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.normWords(col("text"))).as("word"))
      .select(col("doc_id"), bucket.as("dim"), sgn.as("s"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("s")).as("v"), count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("dim"), col("v")))).as("m"),
        sum(col("cnt")).as("n_tok"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(15)),
          d => coalesce(element_at(col("m"), d), lit(0.0)) /
            col("n_tok").cast("double")).as("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val kernel = docs
      .select(col("doc_id"),
        graft.functions.GraftFunctions.normWords(col("text")).as("__ws"))
      .filter(size(col("__ws")) > 0)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.hashedFeatures(col("__ws"), 16)
          .as("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(kernel === composed)
    // contrib parity: LogitContrib vs zip_with/aggregate/transform
    val w = Array(0.3, -0.7, 0.1) // 2 weights + bias
    val feats = separable(40)
    val wArr = array(w.take(2).map(lit).toIndexedSeq: _*)
    val z = aggregate(zip_with(col("features"), wArr, (f, wj) => f * wj),
      lit(0.0), (acc, x) => acc + x) + lit(w(2))
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val err = p - col("label").cast("double")
    val loss = -(col("label").cast("double") * log(greatest(p, lit(1e-12))) +
      (lit(1.0) - col("label")) * log(greatest(lit(1.0) - p, lit(1e-12))))
    val composedC = feats.select(col("doc_id"),
      concat(transform(col("features"), f => f * err), array(err, loss)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val kernelC = feats.select(col("doc_id"),
      graft.functions.GraftFunctions.logitContrib(col("features"),
        array(w.map(lit).toIndexedSeq: _*), col("label")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(kernelC === composedC)
  }

  test("loss decreases monotonically and separable data is learned") {
    val feats = separable(400).persist()
    val (w, losses) = Training.logisticRegression(feats, "features",
      "label", dim = 2, iters = 20, lr = 2.0)
    assert(losses.zip(losses.tail).forall { case (a, b) => b <= a + 1e-12 },
      s"loss must not increase: $losses")
    assert(losses.last < 0.25 * losses.head,
      s"loss should drop sharply on separable data: ${losses.head} -> ${losses.last}")
    val acc = Training.score(feats, "features", w)
      .select(((col("p") > 0.5).cast("int") === col("label")).cast("int").as("ok"))
      .agg(avg(col("ok"))).first().getDouble(0)
    assert(acc >= 0.99, s"separable data must be learned, acc=$acc")
    assert(w(0) > 0.0, "the informative dim must get positive weight")
    assert(math.abs(w(1)) < math.abs(w(0)),
      "the noise dim must matter less than the signal dim")
    feats.unpersist()
  }

  test("DECIMAL-quantized gradients make the trajectory partitioning-invariant") {
    val base = separable(300)
    val runs = Seq(1, 7).map { parts =>
      val f = base.repartition(parts).persist()
      val r = Training.logisticRegression(f, "features", "label",
        dim = 2, iters = 8, lr = 1.0)
      f.unpersist()
      r
    }
    val Seq((wA, lA), (wB, lB)) = runs
    assert(wA.toSeq == wB.toSeq,
      s"weights diverged under repartitioning: ${wA.toSeq} vs ${wB.toSeq}")
    assert(lA == lB, "loss trajectories diverged under repartitioning")
  }

  test("DecimalVectorSum: exact element-wise sums, merge-order independent") {
    val rows = (1 to 999).map(i =>
      Tuple1(Seq(0.1, i * 1e-7, -0.1))).toDF("v")
    for (parts <- Seq(1, 8)) {
      val s = rows.repartition(parts)
        .agg(graft.functions.DecimalVectorSum.vectorSum(col("v"), 3).as("vs"))
        .select(col("vs.n"), col("vs.sums")).first()
      assert(s.getLong(0) == 999L)
      val sums = s.getSeq[Double](1)
      // 999 × 0.1 in exact decimal is exactly 99.9 — float fold would drift
      assert(sums(0) == 99.9, s"exact decimal sum expected, got ${sums(0)}")
      assert(sums(2) == -99.9)
      assert(math.abs(sums(1) - (1 to 999).map(_ * 1e-7).sum) < 1e-9)
    }
  }

  test("end-to-end quality classifier on documents: sane shape, learning happens") {
    val out = SparkEntry.queries("q166_train_classifier")(spark, sf).collect()
    assert(out.length == 65, "64 hashed dims + bias")
    val first = out.head
    val lossFirst = first.getAs[Double]("loss_first")
    val lossLast = first.getAs[Double]("loss_last")
    assert(lossLast < lossFirst,
      s"training must reduce loss: $lossFirst -> $lossLast")
    assert(out.map(_.getAs[Int]("dim")).toSeq == (0 to 64))
  }
}
