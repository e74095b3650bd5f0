package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the validation gate a pipeline runs
  * before (or after) every ingest: declarative constraints evaluated
  * at full scale, reported as one row per constraint. The Deequ-shaped
  * capability, composed from DataFrame algebra.
  *
  * Scale design: all row-level predicates for a table fold into ONE
  * aggregate over ONE scan (each check is a `sum(violation)` column of
  * the same Aggregate node — adding a check adds no pass); uniqueness
  * is a two-phase count-distinct; referential integrity is a left-anti
  * join that broadcasts whichever side is small. Nothing collects;
  * the report is itself a DataFrame.
  */
object Quality {

  /** Evaluate row-level expectations in one scan. Each element of
    * `checks` is (constraint name, VIOLATION predicate — true when the
    * row breaks the rule).
    */
  def expectations(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val aggs = checks.map { case (n, viol) =>
      sum(when(viol, 1L).otherwise(0L)).as(n)
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.map { case (n, _) =>
        // backtick-quote: constraint names may contain dots
        struct(lit(n).as("constraint"),
          coalesce(col(s"`$n`"), lit(0L)).as("n_violations"))
      }: _*)).as("c"))
      .select(col("c.constraint").as("constraint"),
        col("c.n_violations").as("n_violations"))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Uniqueness expectation: n_violations = rows beyond the first per
    * duplicated key (0 when the column set is a key). */
  def checkUnique(df: DataFrame, name: String, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("n_violations"))
      .select(lit(name).as("constraint"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))

  /** Referential-integrity expectation: child rows whose key has no
    * match in the parent. The anti-join broadcasts the small side
    * (typically the parent's distinct keys). */
  def checkForeignKey(child: DataFrame, parent: DataFrame, name: String,
                      childKey: String, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("constraint"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
}
