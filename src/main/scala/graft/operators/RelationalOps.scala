package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark-first re-expressions of the reference pipeline's dplyr/tidyr
  * verbs (see SURVEY.md §2.1).
  *
  * Each operator is pure DataFrame algebra — lazily planned, fully
  * visible to Catalyst (pushdown / pruning / join reorder / AQE), no
  * driver-side materialization. Reference sites are cited per method.
  */
object RelationalOps {

  implicit class GraftDataFrameOps(val df: DataFrame) extends AnyVal {

    /** Positional column selection + rename —
      * reference/scripts/tidy/temp-tidy-all-manuscript-files.R:36,80-81
      * (`scones[, c(1, 17, 19)]`, `names(shet_post) <- c(...)`): pick
      * columns by 0-based position and assign new names in one step.
      * Pure projection — prunes at the scan.
      */
    def selectPositions(positions: Seq[Int], names: Seq[String]): DataFrame = {
      require(positions.length == names.length,
        s"${positions.length} positions vs ${names.length} names")
      val cols = df.columns
      df.select(positions.zip(names).map { case (p, n) => col(cols(p)).as(n) }: _*)
    }

    /** Promote the first row (in `orderCol` order) to column names —
      * reference/scripts/tidy/temp-tidy-all-manuscript-files.R:109-110
      * (`setNames(as.character(.[1,])) %>% slice(-1)`): the Rosen
      * supplements carry their header as the first data row. The
      * header row is a 1-row collect (driver-side, dimension-scale by
      * nature); the body stays a lazy plan.
      */
    def promoteHeader(orderCol: String): DataFrame = {
      val orderIdx = df.columns.indexOf(orderCol)
      val first = df.orderBy(col(orderCol)).limit(1).collect()(0)
      val body = df.filter(col(orderCol) =!= lit(first.get(orderIdx)))
      body.select(df.columns.zipWithIndex.map { case (c, i) =>
        if (i == orderIdx) col(c) // the ordering column keeps its name
        else {
          val name = Option(first.get(i)).map(_.toString).filter(_.nonEmpty).getOrElse(c)
          col(c).cast("string").as(name)
        }
      }: _*)
    }

    /** `tidyr::separate_rows(col, sep)` —
      * reference/scripts/tidy/temp-tidy-all-api-ftp-files.R:26,37,48,60.
      *
      * Explodes a delimiter-packed string column into one row per
      * element, dropping empty fragments (the reference always chains
      * `filter(x != "")`). Explode is narrow (no shuffle); at 100 TB
      * this scales linearly with input.
      */
    def separateRows(colName: String, sep: String): DataFrame =
      df.withColumn(colName, explode(split(col(colName), sep)))
        .filter(col(colName) =!= "")

    /** The `hgnc_symbol_template_func()` idiom —
      * reference/utils/hgnc_symbol_template_func.R:3-10 and its ~25 call
      * sites: LEFT JOIN a tidied source onto the distinct key template,
      * then distinct().
      *
      * The template (the gene universe, ~20k keys) is broadcast: at
      * 100 TB the fact side never shuffles for this join.
      */
    def templateJoin(template: DataFrame, keys: Seq[String]): DataFrame =
      broadcast(template).join(df, keys, "left").distinct()

    /** Keep-singletons conflict dedup —
      * reference/scripts/tidy/temp-tidy-all-api-ftp-files.R:213-219
      * (IMPC viability: drop genes whose one-to-many mouse mapping
      * yields conflicting values).
      *
      * Keeps only rows whose key maps to exactly one distinct value of
      * `valueCol`. One shuffle on the key with map-side partial
      * aggregation; the semi-join back is on the same key so AQE can
      * plan it shuffle-free.
      */
    def keepSingletons(keyCols: Seq[String], valueCol: String): DataFrame = {
      val singles = df
        .groupBy(keyCols.map(col): _*)
        .agg(countDistinct(col(valueCol)).as("__n"))
        .filter(col("__n") === 1)
        .drop("__n")
      df.join(singles, keyCols, "left_semi")
    }

    /** Nullify-conflicts dedup —
      * reference/scripts/tidy/temp-tidy-all-api-ftp-files.R:268-270
      * (`mutate(across(-key, ~ifelse(key %in% dups, NA, .))) %>%
      * distinct()`): keys mapping to MULTIPLE rows keep exactly ONE
      * row with all annotation columns nulled (vs [[keepSingletons]],
      * which drops the key entirely).
      *
      * One window count over one key shuffle (no second join); the
      * trailing distinct() collapses each conflicted key's rows —
      * identical after nulling — into one. Scales as a single
      * hash-exchange on the key.
      */
    def nullifyConflicts(keyCols: Seq[String], valueCols: Seq[String]): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(keyCols.map(col): _*)
      val marked = df.withColumn("__n", count(lit(1)).over(w))
      valueCols.foldLeft(marked) { (d, c) =>
        d.withColumn(c, when(col("__n") > 1, lit(null)).otherwise(col(c)))
      }.drop("__n").distinct()
    }

    /** Sorted string-collapse aggregation —
      * reference/scripts/tidy/temp-tidy-all-api-ftp-files.R:258-261
      * (`summarise(paste0(unique(x), collapse="|"))` after arrange).
      *
      * collect_set is bounded by the per-key distinct-value count (small
      * in the reference: phenotype flags), so the partial aggregation
      * stays map-side combinable.
      */
    def collapseDistinct(keyCols: Seq[String], valueCol: String,
                         sep: String, outName: String): DataFrame =
      df.groupBy(keyCols.map(col): _*)
        .agg(array_join(array_sort(collect_set(col(valueCol))), sep).as(outName))

    /** Keep the top-ranked row per key —
      * reference/scripts/tidy/temp-tidy-all-web-files.R:158-167 (gnomAD:
      * prefer the MANE-select transcript when a gene has several).
      * orderCols must produce a total order for determinism.
      */
    def topPerKey(keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }

    /** Blank-string → NULL normalization across columns —
      * reference `mutate(across(everything(), ~na_if(.x, "")))`
      * (temp-tidy-all-api-ftp-files.R:17) and `ifelse(. == "-", NA, .)`
      * (.R:411,433).
      */
    def naIf(sentinel: String, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.withColumn(c, when(col(c) === sentinel, lit(null)).otherwise(col(c))))
  }
}
