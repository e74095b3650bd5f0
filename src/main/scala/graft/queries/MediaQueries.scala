package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Multimodal, Selection}

/** SURVEY.md §2.3 (round 9) — multimodal BATCH ASSEMBLY: aspect-ratio
  * bucketing + fixed-size batch packing over the media metadata the
  * corpus already carries (Multimodal.attachBinary's integer-derived
  * width/height — the same rows q88's resize plan reads).
  *
  * Vision-language training can't batch a portrait with a panorama:
  * images are grouped into a small ladder of canonical aspect buckets
  * (the SDXL/NaViT recipe) and packed into fixed-size batches within
  * each bucket. Bucket choice is EXACT integer arithmetic — the
  * nearest ratio a/b to w/h minimizes |w·b − a·h| · (L/b) with
  * L = lcm(denominators), so no float division can flip a verdict
  * cross-engine. Batch sequence numbers come from the GROUPED
  * distributed prefix sum (Selection.groupedPrefixSum), never a
  * 5-partition global window.
  */
object MediaQueries {

  type Q = (SparkSession, String) => DataFrame

  /** (idx, a, b, 144/b) — the bucket ladder; 144 = lcm(1,3,4,9,16). */
  private val ladder = Seq(
    (0, 1, 1, 144), (1, 4, 3, 48), (2, 3, 4, 36), (3, 16, 9, 16), (4, 9, 16, 9))

  val queries: Map[String, Q] = Map(
    // §2.3 (round 9) — aspect bucketing + batch packing: narrow
    // integer argmin picks the bucket, grouped prefix sum assigns
    // per-bucket sequence numbers (scale-safe: no per-bucket global
    // window), per-(bucket, batch) rollup reports fill + ViT patch
    // load (q88's exact resize arithmetic).
    "q172_aspect_batch" -> { (s, d) =>
      val B = 16
      val media = Multimodal.attachBinary(Tables.documents(s, d))
        .select(col("doc_id"), col("meta.width").as("w"), col("meta.height").as("h"))
      val scored = ladder.map { case (i, a, b, scale) =>
        struct(abs(col("w") * b - col("h") * a) * scale,
          lit(i).as("idx"))
      }
      val bucketed = media.withColumn("bucket",
        array_min(array(scored: _*)).getField("idx"))
      val seq = Selection.groupedPrefixSum(bucketed,
        Seq(col("bucket")), Seq(col("doc_id")), lit(1L))
      // all-integer resize/patch math (q88 arithmetic): `div`, not `/`
      seq
        .withColumn("batch_id", expr(s"(cum_weight - 1) div $B"))
        .withColumn("n_patches", expr(
          "cast(((greatest(1, (w * 224) div greatest(w, h)) + 15) div 16) * " +
            "((greatest(1, (h * 224) div greatest(w, h)) + 15) div 16) as bigint)"))
        .groupBy(col("bucket"), col("batch_id"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("n_patches")).as("total_patches"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("bucket"), col("batch_id"))
    },

    // §2.3 (round 9) — AUDIO frame-window planning: the preprocessing
    // bookkeeping a speech pipeline computes BEFORE touching samples
    // (the q88 resize-plan discipline for the audio modality) —
    // 400 ms frames on a 160 ms hop over synthetic metadata
    // (sample_rate ladder, n_samples from n_chars), frame/hop/count/
    // tail all EXACT integer arithmetic (sr·2/5 and sr·4/25 are whole
    // samples for every ladder rate), so the plan is metadata-only,
    // narrow, and byte-identical cross-engine. Decode itself stays
    // behind the declared Multimodal stub.
    "q183_audio_windows" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("element_at(array(8000, 16000, 44100), cast(doc_id % 3 as int) + 1)")
            .as("sample_rate"),
          (col("n_chars") * 100 + 1).cast("long").as("n_samples"))
        .withColumn("frame", expr("(sample_rate * 2) div 5").cast("long"))
        .withColumn("hop", expr("(sample_rate * 4) div 25").cast("long"))
        .withColumn("n_frames",
          expr("CASE WHEN n_samples >= frame THEN 1 + (n_samples - frame) div hop ELSE 0 END")
            .cast("long"))
        .withColumn("tail_samples",
          expr("CASE WHEN n_frames > 0 THEN n_samples - (frame + (n_frames - 1) * hop) ELSE n_samples END")
            .cast("long"))
        .orderBy(col("doc_id"))
    },

    // §2.3 (round 10) — VIDEO storyboard planning: the third modality's
    // metadata-only preprocessing plan (q88 images, q183 audio, THIS
    // video) — fixed 4-second scene cuts over synthetic (fps,
    // duration) metadata, k=4 uniformly-strided sample frames per
    // scene (i·len div k is strictly increasing for k ≤ len, so picks
    // never collide), and 4×4 contact-sheet packing with an explicit
    // last-sheet pad. EXACT integer arithmetic end to end (div, never
    // /), the per-doc rollup carries an order-invariant sampled-frame
    // checksum, and decode stays behind the declared Multimodal stub.
    // Narrow explode → one doc-key rollup; nothing scales worse than
    // frames sampled.
    "q191_video_storyboard" -> { (s, d) =>
      val base = Tables.documents(s, d)
        .select(col("doc_id"),
          expr("element_at(array(24, 25, 30), cast(doc_id % 3 as int) + 1)")
            .cast("long").as("fps"),
          (col("n_chars") * 40 + 500).cast("long").as("duration_ms"))
        .withColumn("n_frames", expr("(duration_ms * fps) div 1000"))
        .withColumn("scene_len", col("fps") * 4)
        .withColumn("n_scenes", expr("(n_frames + scene_len - 1) div scene_len"))
      val scenes = base
        .select(col("doc_id"), col("n_frames"), col("n_scenes"),
          col("scene_len"), explode(expr("sequence(0L, n_scenes - 1)")).as("scene_id"))
        .withColumn("scene_start", col("scene_id") * col("scene_len"))
        .withColumn("scene_frames",
          least(col("scene_len"), col("n_frames") - col("scene_start")))
        .withColumn("k", least(lit(4L), col("scene_frames")))
      scenes
        .select(col("doc_id"), col("n_frames"), col("n_scenes"),
          explode(expr(
            "transform(sequence(0L, k - 1), i -> scene_start + (i * scene_frames) div k)"))
            .as("frame_no"))
        .groupBy(col("doc_id"))
        .agg(max(col("n_frames")).as("n_frames"),
          max(col("n_scenes")).as("n_scenes"),
          count(lit(1)).as("n_samples"),
          sum(col("frame_no")).cast("long").as("frames_checksum"),
          min(col("frame_no")).as("first_frame"),
          max(col("frame_no")).as("last_frame"))
        .withColumn("n_sheets", expr("(n_samples + 15) div 16"))
        .withColumn("last_sheet_pad", expr("(16 - n_samples % 16) % 16"))
        .orderBy(col("doc_id"))
    },

    // §2.3 (round 12) — CROSS-MODAL ALIGNMENT audit (the CLIP-score
    // shape): the multimodal family finally RELATES modalities. Each
    // "image" carries a stub vision-encoder feature — its paired text
    // embedding perturbed by deterministic integer-derived noise (a
    // declared stand-in, like Multimodal.decodeFrames: real encoders
    // aren't in this container, but the stub is exact integer + IEEE
    // arithmetic, so unlike q117 the whole audit ORACLE-checks) — and
    // a PLANTED caption mixup: every img_id ≡ 5 (mod 17) was
    // "captioned" with its successor's text. The audit scores every
    // pair's own-caption cosine, then MINES mismatches over a bounded
    // audit slice (img_id < 170) with the broadcast top-1 machinery
    // (q193's argmax-by-struct discipline — no corpus-wide window):
    // best_id ≠ img_id flags the mixup and recovers the true caption.
    // Scale path: the mining slice stays audit-sized by contract;
    // corpus-wide mining swaps the brute-force cross join for
    // Similarity.annLsh candidates with the argmax unchanged.
    "q213_clip_align" -> { (s, d) =>
      import graft.Caching.ScopedPersist
      import graft.functions.GraftFunctions
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val src = emb.select(col("vec_id").as("img_id"),
        when(col("vec_id") % 17 === 5, col("vec_id") + 1)
          .otherwise(col("vec_id")).as("src_id"))
      val img = src.join(emb.select(col("vec_id").as("src_id"),
          col("embedding").as("src_emb")), "src_id")
        .select(col("img_id"), expr(
          "transform(src_emb, (x, i) -> cast(cast(x as double) + " +
          "(cast((img_id * 31 + i * 7) % 11 as double) - 5.0D) / 50.0D as float))")
          .as("img_emb"))
        .scopedPersist() // consumers: own-pair scoring + mining slice
      val own = img.join(emb.select(col("vec_id").as("img_id"),
          col("embedding").as("own_emb")), "img_id")
        .select(col("img_id"),
          round(GraftFunctions.cosine(col("img_emb"), col("own_emb")), 6)
            .as("own_cos"))
      val audit = img.filter(col("img_id") < 170)
      val scored = emb.select(col("vec_id").as("cand_id"),
          col("embedding").as("cand_emb"))
        .crossJoin(broadcast(audit))
        .select(col("img_id"), col("cand_id"),
          round(GraftFunctions.cosine(col("img_emb"), col("cand_emb")), 6)
            .as("cos"))
      val best = scored.groupBy(col("img_id"))
        .agg(max(struct(col("cos"), (-col("cand_id")).as("neg_id"))).as("b"))
        .select(col("img_id"), col("b.cos").as("best_cos"),
          (-col("b.neg_id")).as("best_id"))
      best.join(own, "img_id")
        .select(col("img_id"), col("own_cos"), col("best_id"),
          col("best_cos"), (col("best_id") =!= col("img_id")).as("is_mismatch"))
        .orderBy(col("img_id"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    // meta mirror: width = n_chars % 640 + 1, height = (doc_id*37) % 480 + 1
    "q172_aspect_batch" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    n_chars % 640 + 1 AS w,
        |    (doc_id * 37) % 480 + 1 AS h
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, w, h,
        |    abs(w * 1 - h * 1) * 144 AS s0,
        |    abs(w * 3 - h * 4) * 48 AS s1,
        |    abs(w * 4 - h * 3) * 36 AS s2,
        |    abs(w * 9 - h * 16) * 16 AS s3,
        |    abs(w * 16 - h * 9) * 9 AS s4
        |  FROM m),
        |bk AS (
        |  SELECT doc_id, w, h,
        |    CASE
        |      WHEN s0 <= s1 AND s0 <= s2 AND s0 <= s3 AND s0 <= s4 THEN 0
        |      WHEN s1 <= s2 AND s1 <= s3 AND s1 <= s4 THEN 1
        |      WHEN s2 <= s3 AND s2 <= s4 THEN 2
        |      WHEN s3 <= s4 THEN 3
        |      ELSE 4
        |    END AS bucket
        |  FROM sc),
        |sq AS (
        |  SELECT doc_id, w, h, bucket,
        |    (ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) - 1) // 16
        |      AS batch_id,
        |    GREATEST(1, (w * 224) // GREATEST(w, h)) AS out_w,
        |    GREATEST(1, (h * 224) // GREATEST(w, h)) AS out_h
        |  FROM bk)
        |SELECT bucket, CAST(batch_id AS BIGINT) AS batch_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(((out_w + 15) // 16) * ((out_h + 15) // 16)) AS BIGINT)
        |    AS total_patches,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
        |FROM sq GROUP BY bucket, batch_id ORDER BY bucket, batch_id""".stripMargin,

    // same scene/sample integer arithmetic; // is DuckDB int division
    "q191_video_storyboard" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 25 ELSE 30 END AS fps,
        |    n_chars * 40 + 500 AS duration_ms
        |  FROM documents),
        |b AS (SELECT doc_id, fps, (duration_ms * fps) // 1000 AS n_frames,
        |             fps * 4 AS scene_len FROM m),
        |c AS (SELECT *, (n_frames + scene_len - 1) // scene_len AS n_scenes FROM b),
        |sc AS (SELECT doc_id, n_frames, n_scenes, scene_len,
        |         unnest(generate_series(0, n_scenes - 1)) AS scene_id FROM c),
        |sf AS (SELECT *, scene_id * scene_len AS scene_start,
        |         least(scene_len, n_frames - scene_id * scene_len) AS scene_frames
        |       FROM sc),
        |sk AS (SELECT *, least(4, scene_frames) AS k FROM sf),
        |samp AS (SELECT doc_id, n_frames, n_scenes,
        |           unnest([scene_start + (i * scene_frames) // k
        |                   FOR i IN generate_series(0, k - 1)]) AS frame_no
        |         FROM sk)
        |SELECT doc_id, CAST(MAX(n_frames) AS BIGINT) AS n_frames,
        |  CAST(MAX(n_scenes) AS BIGINT) AS n_scenes,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM(frame_no) AS BIGINT) AS frames_checksum,
        |  CAST(MIN(frame_no) AS BIGINT) AS first_frame,
        |  CAST(MAX(frame_no) AS BIGINT) AS last_frame,
        |  CAST((COUNT(*) + 15) // 16 AS BIGINT) AS n_sheets,
        |  CAST((16 - COUNT(*) % 16) % 16 AS BIGINT) AS last_sheet_pad
        |FROM samp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // stub vision feature mirrored as a 1-based list comprehension
    // ((i-1)*7 ≡ Spark's 0-based i*7); cosine parity via
    // list_cosine_similarity on DOUBLE[] (the q34 precedent); top-1
    // via row_number on the round(.,6) landscape + cand_id tie-break
    "q213_clip_align" ->
      """WITH src AS (
        |  SELECT vec_id AS img_id,
        |    CASE WHEN vec_id % 17 = 5 THEN vec_id + 1 ELSE vec_id END AS src_id
        |  FROM embeddings),
        |img AS (
        |  SELECT s.img_id,
        |    [CAST(CAST(se.embedding[i] AS DOUBLE) +
        |       (CAST((s.img_id * 31 + (i - 1) * 7) % 11 AS DOUBLE) - 5.0) / 50.0
        |       AS FLOAT)
        |     FOR i IN generate_series(1, len(se.embedding))] AS img_emb
        |  FROM src s JOIN embeddings se ON se.vec_id = s.src_id),
        |own AS (
        |  SELECT i.img_id,
        |    round(list_cosine_similarity(CAST(i.img_emb AS DOUBLE[]),
        |      CAST(e.embedding AS DOUBLE[])), 6) AS own_cos
        |  FROM img i JOIN embeddings e ON e.vec_id = i.img_id),
        |mine AS (
        |  SELECT i.img_id, c.vec_id AS cand_id,
        |    round(list_cosine_similarity(CAST(i.img_emb AS DOUBLE[]),
        |      CAST(c.embedding AS DOUBLE[])), 6) AS cos
        |  FROM img i CROSS JOIN embeddings c
        |  WHERE i.img_id < 170),
        |best AS (
        |  SELECT img_id, cand_id, cos,
        |    row_number() OVER (PARTITION BY img_id
        |      ORDER BY cos DESC, cand_id) AS rn
        |  FROM mine)
        |SELECT b.img_id, o.own_cos, b.cand_id AS best_id, b.cos AS best_cos,
        |  (b.cand_id <> b.img_id) AS is_mismatch
        |FROM best b JOIN own o ON o.img_id = b.img_id
        |WHERE b.rn = 1
        |ORDER BY b.img_id""".stripMargin,

    "q183_audio_windows" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    [8000, 16000, 44100][CAST(doc_id % 3 AS INT) + 1] AS sample_rate,
        |    CAST(n_chars * 100 + 1 AS BIGINT) AS n_samples
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, sample_rate, n_samples,
        |    CAST((sample_rate * 2) // 5 AS BIGINT) AS frame,
        |    CAST((sample_rate * 4) // 25 AS BIGINT) AS hop
        |  FROM m),
        |n AS (
        |  SELECT *, CAST(CASE WHEN n_samples >= frame
        |                      THEN 1 + (n_samples - frame) // hop
        |                      ELSE 0 END AS BIGINT) AS n_frames
        |  FROM f)
        |SELECT doc_id, sample_rate, n_samples, frame, hop, n_frames,
        |  CAST(CASE WHEN n_frames > 0
        |            THEN n_samples - (frame + (n_frames - 1) * hop)
        |            ELSE n_samples END AS BIGINT) AS tail_samples
        |FROM n ORDER BY doc_id""".stripMargin
  )
}
