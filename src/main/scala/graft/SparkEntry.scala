package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q27_annotation_pipeline")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.ReferenceQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.TemporalQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.SketchQueries.queries ++
      graft.queries.AnalyticQueries.queries ++
      graft.queries.OpsQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.RetrievalQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.BehaviorQueries.queries ++
      graft.queries.WebQueries.queries ++
      graft.queries.MediaQueries.queries ++
      graft.queries.StatsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.ReferenceQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.TemporalQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.SketchQueries.oracleSql ++
      graft.queries.AnalyticQueries.oracleSql ++
      graft.queries.OpsQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql ++
      graft.queries.RetrievalQueries.oracleSql ++
      graft.queries.GraphQueries.oracleSql ++
      graft.queries.BehaviorQueries.oracleSql ++
      graft.queries.WebQueries.oracleSql ++
      graft.queries.MediaQueries.oracleSql ++
      graft.queries.StatsQueries.oracleSql
}
