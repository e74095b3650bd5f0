package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.3 #40 — multimodal columns: opaque binary payloads +
  * typed metadata. Since round 6 the HEADER decode is REAL —
  * [[decodeImageMeta]] parses PNG/BMP container bytes (format,
  * width, height, channels) with a pure-JVM codegen'd expression, no
  * codec library needed. Pixel decoding ([[decodeFrames]]) remains a
  * declared deterministic fake (no image/audio codecs in this
  * container); its Spark-side plumbing — schema, batched
  * per-partition decode, frame-sample explode, content-hash
  * partitioning — is real.
  */
object Multimodal {

  /** REAL container-header decode over a binary payload column: one
    * narrow codegen'd pass ([[graft.functions.ImageHeader]]) emitting
    * struct(format, width, height, channels); non-image payloads come
    * back format='unknown' with null dims rather than erroring, the
    * right behavior for a mixed 100 TB corpus scan.
    */
  def decodeImageMeta(media: DataFrame, payloadCol: String = "payload"): DataFrame =
    media.withColumn("img",
      graft.functions.ImageFunctions.imageHeader(col(payloadCol)))

  /** media metadata struct carried next to every binary payload */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Attach a binary payload + metadata to the documents table (the
    * test corpus has no real media, so the payload is the utf-8 text —
    * the schema and plan shape are what a real corpus would carry).
    * All metadata is integer-derived ⇒ oracle-expressible.
    */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("video/fake").as("media_type"),
        octet_length(encode(col("text"), "utf-8")).cast("long").as("n_bytes"),
        (col("n_chars") % 640 + 1).cast("int").as("width"),
        ((col("doc_id") * 37) % 480 + 1).cast("int").as("height"),
        (col("n_chars") % 24 + 1).cast("int").as("n_frames")).as("meta"))

  /** Resize planning + ViT patch-count math over the media metadata —
    * the preprocessing bookkeeping a vision pipeline computes BEFORE
    * touching pixels (so it runs on metadata only, never the
    * payload): aspect-preserving fit into a `target`-square box using
    * EXACT integer arithmetic (floor division — no float scale
    * factor), then ceil-division patch counts for a `patch`-sized
    * grid. Narrow codegen'd pass; oracle-expressible.
    */
  def resizePlan(media: DataFrame, target: Int = 224, patch: Int = 16): DataFrame = {
    val outW = s"greatest(1, (meta.width * $target) div greatest(meta.width, meta.height))"
    val outH = s"greatest(1, (meta.height * $target) div greatest(meta.width, meta.height))"
    media.select(col("doc_id"),
      col("meta.width").as("in_w"), col("meta.height").as("in_h"),
      expr(outW).cast("int").as("out_w"), expr(outH).cast("int").as("out_h"),
      expr(s"cast((( ($outW) + ${patch - 1}) div $patch) * ((($outH) + ${patch - 1}) div $patch) AS bigint)")
        .as("n_patches"))
  }

  /** Deterministic stand-in for a codec: a real implementation would
    * hand `payload` to an image/audio library per batch. Returns a
    * per-frame feature (here: a stable hash-derived float), exploded
    * one row per sampled frame — the Spark-side batch shape
    * (mapPartitions, iterator-to-iterator, no per-row JNI setup)
    * is exactly what a real decoder needs.
    */
  def decodeFrames(spark: SparkSession, media: DataFrame, sampleEvery: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("feature", DoubleType)))
    media.select(col("doc_id"), col("payload"), col("meta.n_frames").as("n_frames"))
      .mapPartitions { rows =>
        // batched decode: one "codec init" per partition, not per row
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val nFrames = r.getInt(2)
          (0 until nFrames by sampleEvery).iterator.map { f =>
            // ??? real codec goes here; deterministic fake feature:
            val h = scala.util.hashing.MurmurHash3.bytesHash(payload, f)
            Row(id, f, (h & 0x7fffffff).toDouble / Int.MaxValue)
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
