package graft.sources

import org.apache.spark.sql.DataFrame
import scala.collection.mutable
import scala.util.control.NonFatal

/** SURVEY.md §2.2 #29 — the reference's per-source `tryCatch` +
  * error-log ingest pattern (import-api-ftp.R wraps every fetch in
  * tryCatch and appends to `log_errors`).
  *
  * Sources are registered as named thunks; `run` materializes each
  * lazily-planned DataFrame's schema (cheap — no data read), records
  * failures, and returns only the sources that loaded. Failure of one
  * source never aborts the batch.
  */
final class Ingest {
  private val errors = mutable.LinkedHashMap.empty[String, String]
  private val loaded = mutable.LinkedHashMap.empty[String, DataFrame]

  def source(name: String)(load: => DataFrame): this.type = {
    try {
      val df = load
      df.schema // force plan resolution; analysis errors surface here
      loaded += name -> df
    } catch {
      case NonFatal(e) => errors += name -> String.valueOf(e.getMessage)
    }
    this
  }

  def results: Map[String, DataFrame] = loaded.toMap
  def errorLog: Map[String, String] = errors.toMap
}
