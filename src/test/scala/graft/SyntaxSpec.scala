package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Retrieval, TextAnalysis}
import graft.syntax._

/** The fluent facade must be pure forwarding: identical plans and
  * results to the operator objects.
  */
class SyntaxSpec extends SparkSpecBase {

  private lazy val docs = Tables.documents(spark, sf)

  test("facade results match operator-object results") {
    assert(docs.exactDedup("doc_id", "text").collect().toSeq ==
      Dedup.exactDedup(docs, "doc_id", "text").collect().toSeq)
    assert(docs.qualityScore("doc_id", "text").collect().toSeq ==
      TextAnalysis.qualityScore(docs, "doc_id", "text").collect().toSeq)
    assert(docs.chunkTokens("doc_id", "text").collect().toSeq ==
      Retrieval.chunkDocuments(docs, "doc_id", "text").collect().toSeq)
  }

  test("facade chains like the reference's pipeline verbs") {
    val kept = docs
      .qualityScore("doc_id", "text")
      .filter(col("keep") === 1)
      .join(docs, "doc_id")
      .exactDedup("doc_id", "text")
    assert(kept.count() > 0)
  }

  test("facade adds no plan nodes (pure forwarding)") {
    val viaFacade = docs.langId("doc_id", "text").queryExecution.optimizedPlan
    val direct = TextAnalysis.langId(docs, "doc_id", "text").queryExecution.optimizedPlan
    assert(viaFacade.sameResult(direct), "facade must produce the identical plan")
  }

  test("round-6 facade verbs forward to their operators") {
    val batch = docs.filter(col("doc_id") >= 450)
    val corpus = docs.filter(col("doc_id") < 450)
    assert(corpus.dedupIncrement(batch, "doc_id", "text").collect().toSeq ==
      Dedup.incrementalLshDedup(corpus, batch, "doc_id", "text").collect().toSeq)
    assert(docs.removeBoilerplate("doc_id", "text").collect().toSeq ==
      TextAnalysis.removeBoilerplate(docs, "doc_id", "text").collect().toSeq)
  }
}
