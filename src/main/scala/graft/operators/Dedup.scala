package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** SURVEY.md §2.3 #30-33 — document deduplication at training-corpus
  * scale. All stages are shuffle-on-key DataFrame algebra: never
  * O(n²), no driver-side state.
  */
object Dedup {

  /** Exact dedup on normalized text: md5 group, keep lowest id.
    * One shuffle on the 128-bit hash; at 100 TB the hash key is
    * uniformly distributed so no skew handling is needed.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(concat_ws(" ", GraftFunctions.normWords(col(textCol)))).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures: distinct (doc, shingle) → cross the seed set →
    * min(md5(seed:shingle)) per (doc, seed).
    *
    * Seeds come from `explode` of a literal array (no join). The
    * shuffle is on doc_id — partial min is computed map-side.
    * md5-as-hash keeps the oracle SQL bit-identical (same md5 in
    * DuckDB); a production deployment would swap in xxhash64 with the
    * same plan shape.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleWidth: Int, nSeeds: Int): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
      GraftFunctions.normWords(col(textCol)).as("ws"))
    val shingles =
      if (shingleWidth == 1) words.select(col("doc_id"), explode(col("ws")).as("sh"))
      else words.select(col("doc_id"),
        explode(GraftFunctions.wordShingles(col("ws"), shingleWidth)).as("sh"))
    // All nSeeds minima in one codegen'd grouped pass: the partial
    // min aggregation is map-side, so only ≤ docs×nSeeds partial rows
    // cross the exchange regardless of shingle count. (A narrow
    // array_min(transform(...)) formulation has zero shuffles but
    // runs interpreted — higher-order functions are CodegenFallback —
    // and measures slower; explode + HashAggregate stays in codegen.)
    val mins = (0 until nSeeds).map(s =>
      min(md5(concat(lit(s + ":"), col("sh")))).as(s"mh_$s"))
    shingles.distinct()
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        posexplode(array((0 until nSeeds).map(s => col(s"mh_$s")): _*)))
      .withColumnRenamed("pos", "seed")
      .withColumnRenamed("col", "minhash")
  }

  /** LSH banding: fold each band's minhashes (in seed order) into one
    * band signature. Collision on (band, band_sig) ⇒ candidate pair.
    */
  def lshBands(signatures: DataFrame, rowsPerBand: Int): DataFrame =
    signatures
      .withColumn("band", expr(s"seed div $rowsPerBand"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("seed"), col("minhash")))),
          x => x.getField("minhash")))).as("band_sig"))

  /** Candidate pairs = docs sharing any band signature. The join key
    * (band, band_sig) is high-cardinality ⇒ well-distributed shuffle;
    * hot buckets (boilerplate dups) are exactly the pairs we want.
    */
  def lshCandidatePairs(bandsIn: DataFrame): DataFrame = {
    // self-join: persist so the minhash pipeline runs once, not twice
    val bands = bandsIn.persist()
    val a = bands.select(col("band"), col("band_sig"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("band_sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard for a set of candidate pairs: explode both
    * sides' distinct shingles, count intersection via join, union by
    * inclusion–exclusion. Pure integer arithmetic until one final
    * double division.
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, idCol: String,
                   textCol: String, shingleWidth: Int): DataFrame = {
    // Shingle SETS stay packed as per-doc arrays: the whole derivation
    // is narrow (no explode, no distinct shuffle), and the pair join
    // moves one array-valued row per doc instead of |shingles| rows.
    // Intersection/union are then O(|set|) array ops per pair.
    // (normWords is bound to a column before shingling — higher-order
    // lambdas disable subexpression elimination.)
    val sets = docs
      .select(col(idCol).as("doc_id"),
        GraftFunctions.normWords(col(textCol)).as("__ws"))
      .persist() // CollapseProject barrier — see minhashSignatures
      .select(col("doc_id"),
        array_distinct(GraftFunctions.wordShingles(col("__ws"), shingleWidth)).as("shset"))
      .filter(size(col("shset")) > 0)
      .persist()
    val a = sets.select(col("doc_id").as("doc_a"), col("shset").as("set_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("shset").as("set_b"))
    pairs.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("set_a"), col("set_b"))).cast("long").as("n_inter"),
        size(col("set_a")).cast("long").as("n_a"),
        size(col("set_b")).cast("long").as("n_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
  }

  /** SimHash near-dup table: 64-bit signature + the 4 16-bit quadrant
    * keys (pigeonhole: hamming ≤ 3 ⇒ at least one identical quadrant),
    * so near-dup search is 4 bucket joins, never a cross product.
    */
  /** All near-dup pairs with hamming(simhash) ≤ maxHamming, found via
    * the 4 quadrant-key bucket joins (pigeonhole: ≤3 flipped bits
    * cannot touch all 4 16-bit quadrants, so every qualifying pair
    * shares at least one quadrant — guaranteed recall for
    * maxHamming ≤ 3; higher thresholds are best-effort).
    * Composed from built-ins (bucket join + bit_count on XOR), per
    * the compose-first extension policy — no custom physical operator
    * needed.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int): DataFrame = {
    val t = simhashTable(docs, idCol, textCol).persist()
    val byQuad = (0 until 4).map { q =>
      val a = t.select(col("doc_id").as("doc_a"),
        col("simhash").as("sig_a"), col(s"quad_$q").as("qk"))
      val b = t.select(col("doc_id").as("doc_b"),
        col("simhash").as("sig_b"), col(s"quad_$q").as("qk"))
      a.join(b, Seq("qk")).filter(col("doc_a") < col("doc_b")).drop("qk")
    }
    byQuad.reduce(_ unionByName _).distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Connected components over a pair list (min-label propagation):
    * the cluster step of near-dup dedup — transitive closure of LSH
    * candidate pairs, one canonical (min) id per duplicate group.
    *
    * Iterative driver-coordinated loop over distributed joins (the
    * MLlib/GraphX pattern): each round every node adopts the minimum
    * label in its neighborhood; converges in O(graph diameter)
    * rounds, which for near-dup clusters (tiny cliques) is 2-3. The
    * edge list and labels stay distributed throughout; the driver
    * only sees the per-round change count.
    */
  def connectedComponents(pairsIn: DataFrame, maxIter: Int = 20): DataFrame = {
    // both direction branches of the edge union consume the pair
    // lineage — persist it or the upstream (LSH) pipeline runs twice
    val pairs = pairsIn.persist()
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
        .withColumnRenamed("src", "node")
      val newLabels = labels
        .join(neighborMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .persist()
      val changed = newLabels
        .join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = newLabels
      converged = changed == 0
      i += 1
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  def simhashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      GraftFunctions.simhash64(GraftFunctions.normWords(col(textCol))).as("simhash"))
      .select(Seq(col("doc_id"), col("simhash")) ++
        (0 until 4).map(q =>
          (shiftrightunsigned(col("simhash"), q * 16) bitwiseAND lit(0xffffL))
            .as(s"quad_$q")): _*)
}
