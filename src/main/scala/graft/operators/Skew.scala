package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** SURVEY.md §4 — skew mitigation. AQE's skew-join split handles most
  * cases at runtime; `saltedJoin` is the explicit fallback for
  * pathological hot keys (e.g. an LSH bucket holding boilerplate
  * duplicated across a large fraction of a 100 TB corpus).
  */
object Skew {

  /** Inner equi-join with an N-way salt on the (assumed skewed) left
    * key: the left side gets a random-free deterministic salt derived
    * from a high-entropy row attribute, the right side is replicated
    * N ways. Result is identical to the unsalted join; the shuffle
    * spreads each hot key over `salts` reducers.
    *
    * `leftSaltSource` must be any column of the left row (unique-ish
    * id preferred) — salting must NOT use rand(): determinism keeps
    * retries/speculative tasks consistent.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftSaltSource: Column, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(leftSaltSource), lit(salts)))
    val saltedRight = right.withColumn("__salt",
      explode(lit((0 until salts).toArray)))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
