package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SURVEY §2.3 (round 9) — HTML/markup boilerplate extraction: the
  * pass every raw web corpus hits BEFORE any other curation operator
  * runs. A jusText/trafilatura-class text-density rule (Pomikálek'11
  * "Removing boilerplate and duplicate content from web corpora"),
  * simplified to the two signals that carry most of the verdict and
  * that stay exactly mirrorable in a SQL oracle:
  *
  *  1. BLOCK SEGMENTATION — the page splits at block-level tag
  *     boundaries (p, div, li, h1-6, header, footer, nav, table
  *     cells, br, …); each fragment is a candidate text block.
  *  2. PER-BLOCK VERDICT — a block is `content` iff it has at least
  *     `minWords` words after tag stripping AND its LINK DENSITY
  *     (anchor-text chars / block chars) is ≤ `maxLinkDensity`.
  *     Nav bars and footer link farms are nearly-all anchor text;
  *     chrome like titles and copyright lines falls under the word
  *     floor; body paragraphs pass both.
  *
  * Everything is a NARROW per-row expression chain — regex split,
  * regex strip, length arithmetic — so extraction fuses into the
  * scan under whole-stage codegen; the only shuffles in the per-doc
  * rollup are the doc groupBy and the output sort. At 100 TB this is
  * exactly the shape you want: no join, no state, embarrassingly
  * parallel over pages.
  */
object Boilerplate {

  /** Block-level tag boundary (case-insensitive, attributes allowed). */
  val blockTagRe: String =
    "(?i)</?(?:p|div|li|h[1-6]|td|th|tr|table|ul|ol|section|article|" +
      "aside|main|header|footer|nav|blockquote|pre|form)[^>]*>|<br[^>]*>"

  private val anchorRe = "(?i)<a[^>]*>([^<]*)</a>"

  private def words(c: Column): Column =
    filter(split(c, " "), w => w =!= "")

  /** Per-block table: (doc_id, block_idx, text, n_words, link_density,
    * verdict) — one row per non-empty block in document order.
    */
  def blocks(docs: DataFrame, idCol: String, htmlCol: String,
             minWords: Int = 5, maxLinkDensity: Double = 0.33): DataFrame = {
    val stripped = regexp_replace(col("__raw"), "<[^>]*>", "")
    val text = trim(regexp_replace(stripped, " +", " "))
    val linkChars = aggregate(
      transform(regexp_extract_all(col("__raw"), lit(anchorRe), lit(1)),
        a => length(a)),
      lit(0), (acc, x) => acc + x)
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(htmlCol), blockTagRe)).as(Seq("block_idx", "__raw")))
      .withColumn("text", text)
      .filter(col("text") =!= "")
      .withColumn("n_words", size(words(col("text"))).cast("long"))
      .withColumn("link_density",
        round(linkChars.cast("double") / greatest(length(col("text")), lit(1)), 6))
      .withColumn("verdict",
        when(col("n_words") >= minWords && col("link_density") <= maxLinkDensity,
          "content").otherwise("boilerplate"))
      .drop("__raw")
  }

  /** Per-doc main-text extraction: (doc_id, n_blocks,
    * n_content_blocks, main_text) — content blocks joined by a single
    * space in document order; empty string when nothing survives.
    */
  def extractMain(docs: DataFrame, idCol: String, htmlCol: String,
                  minWords: Int = 5, maxLinkDensity: Double = 0.33): DataFrame =
    blocks(docs, idCol, htmlCol, minWords, maxLinkDensity)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum((col("verdict") === "content").cast("long")).as("n_content_blocks"),
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("verdict") === "content",
            struct(col("block_idx"), col("text"))))),
          x => x.getField("text"))).as("main_text"))
}
