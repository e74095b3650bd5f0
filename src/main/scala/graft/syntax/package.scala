package graft

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators._

/** Fluent user-facing API — `import graft.syntax._` and every engine
  * operator chains off a DataFrame the way the reference's pipeline
  * verbs chain off a tibble. Pure forwarding (zero-cost `AnyVal`
  * wrapper): each method returns the same declarative plan the
  * underlying operator object builds, so Catalyst sees no difference.
  *
  * A user of the reference migrates like:
  * {{{
  *   import graft.syntax._
  *   docs.qualityScore("doc_id", "text")
  *       .join(docs.exactDedup("doc_id", "text"), "doc_id")
  *   left.asofJoin(orders, key = "user_id", ...)
  * }}}
  */
package object syntax {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    // ---- dedup family -------------------------------------------------
    def exactDedup(idCol: String, textCol: String): DataFrame =
      Dedup.exactDedup(df, idCol, textCol)

    def lshBands(idCol: String, textCol: String, shingleWidth: Int = 3,
                 nSeeds: Int = 8, rowsPerBand: Int = 4): DataFrame =
      Dedup.lshBandsNarrow(df, idCol, textCol, shingleWidth, nSeeds, rowsPerBand)

    def nearDupClusters(idCol: String, textCol: String): DataFrame =
      Dedup.connectedComponentsTwoPhase(
        Dedup.lshCandidatePairs(Dedup.lshBandsNarrow(df, idCol, textCol, 3, 8, 4)))

    def simhashNearDups(idCol: String, textCol: String, maxHamming: Int = 3): DataFrame =
      Dedup.simhashNearDups(df, idCol, textCol, maxHamming)

    /** Dedup `batch` against this corpus without recomputing corpus
      * signatures — `corpus.dedupIncrement(newDocs, ...)`. */
    def dedupIncrement(batch: DataFrame, idCol: String, textCol: String): DataFrame =
      Dedup.incrementalLshDedup(df, batch, idCol, textCol)

    def removeBoilerplate(idCol: String, textCol: String, tileWords: Int = 5,
                          minDocs: Int = 2): DataFrame =
      TextAnalysis.removeBoilerplate(df, idCol, textCol, tileWords, minDocs)

    // ---- text analysis ------------------------------------------------
    def langId(idCol: String, textCol: String): DataFrame =
      TextAnalysis.langId(df, idCol, textCol)

    def qualityScore(idCol: String, textCol: String): DataFrame =
      TextAnalysis.qualityScore(df, idCol, textCol)

    def piiScrub(idCol: String, textCol: String): DataFrame =
      TextAnalysis.piiScrub(df, idCol, textCol)

    def repetitionSignals(idCol: String, textCol: String): DataFrame =
      TextAnalysis.repetitionSignals(df, idCol, textCol)

    def fingerprints(idCol: String, textCol: String): DataFrame =
      TextAnalysis.fingerprints(df, idCol, textCol)

    def decontaminateAgainst(benchmark: DataFrame, idCol: String, textCol: String,
                             n: Int = 8): DataFrame =
      TextAnalysis.contamination(df, benchmark, idCol, textCol, n)

    def bloomDecontaminateAgainst(benchmark: DataFrame, idCol: String, textCol: String,
                                  n: Int = 8, numBits: Int = 1 << 17,
                                  numHashes: Int = 5): DataFrame =
      TextAnalysis.contaminationBloom(df, benchmark, idCol, textCol, n, numBits, numHashes)

    // ---- retrieval ----------------------------------------------------
    def chunkTokens(idCol: String, textCol: String, width: Int = 64,
                    stride: Int = 48): DataFrame =
      Retrieval.chunkDocuments(df, idCol, textCol, width, stride)

    def shuffleIntoShards(idCol: String, salt: String, nShards: Int = 16): DataFrame =
      Retrieval.shuffleIntoShards(df, idCol, salt, nShards)

    def invertedIndex(idCol: String, textCol: String, postingCap: Int = 100): DataFrame =
      Retrieval.invertedIndex(df, idCol, textCol, postingCap)

    def bm25TopK(idCol: String, textCol: String, terms: Seq[String],
                 topK: Int = 20): DataFrame =
      Retrieval.bm25TopK(df, idCol, textCol, terms, topK = topK)

    // ---- embeddings ---------------------------------------------------
    def cosineTopK(queries: DataFrame, k: Int): DataFrame =
      Similarity.bruteForceTopK(df, queries, k)

    def quantizeInt8(idCol: String, vecCol: String): DataFrame =
      Similarity.quantizeInt8(df, idCol, vecCol)

    // ---- temporal -----------------------------------------------------
    def asofJoin(right: DataFrame, key: String, leftTime: String,
                 rightTime: String, leftId: String, tieBreak: String): DataFrame =
      Temporal.asofJoin(df, right, key, leftTime, rightTime, leftId, tieBreak)

    def sessionize(key: String, timeCol: String, idCol: String,
                   gapSeconds: Long): DataFrame =
      Temporal.sessionize(df, key, timeCol, idCol, gapSeconds)

    // ---- skew / scale helpers ----------------------------------------
    def saltedJoinWith(right: DataFrame, key: String, saltSource: Column,
                       salts: Int = 8): DataFrame =
      Skew.saltedJoin(df, right, key, saltSource, salts)
  }
}
