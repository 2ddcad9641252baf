package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Oracle-checked coverage for the multimodal binary-column path: the
  * documents table's text bytes stand in for media payloads, running
  * through the REAL typed-Dataset mapPartitions plumbing
  * (Multimodal.extractFeatures) whose codec is a deterministic stub.
  * The oracle recomputes byte length / sha256 / mean byte in SQL
  * (documents are pure ASCII, so char ops == byte ops in DuckDB).
  */
object MultimodalQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_binary_meta" -> ((s, dir) => {
      // len > 0 like m2–m6: the oracle's mean divides by len(text)
      // (NULL in DuckDB at 0, desyncing from the stub's 0), and a
      // NULL text would NPE inside the digest
      val docs = Tables.load(s, dir, "documents")
        .filter(length(col("text")) > 0)
      Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs))
        .toDF()
        .select(col("media_id"), col("n_bytes"), col("sha256"),
          col("mean_byte_e4"))
        .orderBy("media_id")
    }),

    // REAL image decode: each doc's text bytes are encoded as a
    // genuine grayscale PNG (zero-padded to a 16-wide raster), then
    // decoded back with javax.imageio. The decoded width/height and
    // integer pixel stats are exact functions of the text, so DuckDB
    // verifies that a real encode→decode round trip happened.
    "m2_image_decode" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(length(col("text")) > 0)
      Multimodal.decodeImageFeatures(
        Multimodal.imagesFromDocuments(docs, width = 16))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("px_sum"), col("px_max"))
        .orderBy("media_id")
    }),

    // REAL resize: encode → decode → nearest-neighbor ×2 downsample
    // → re-encode → decode again, all with genuine PNG bytes. The
    // resized raster's pixels are the source pixels at even (row,
    // col) — exact integer functions of the text under the stated
    // top-left convention — so DuckDB verifies the whole
    // decode-resize-encode-decode chain closed-form.
    "m5_image_resize" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(length(col("text")) > 0)
      Multimodal.decodeImageFeatures(
        Multimodal.resizeImageNearest(
          Multimodal.imagesFromDocuments(docs, width = 16), factor = 2))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("px_sum"), col("px_max"))
        .orderBy("media_id")
    }),

    // REAL audio decode: each doc's text bytes become the samples of
    // a genuine 16-bit PCM mono WAV, decoded back with
    // javax.sound.sampled (container parse + full PCM read). The
    // amplitude stats are exact integer functions of the text, so
    // DuckDB verifies that a real encode→decode round trip happened.
    "m3_audio_decode" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(length(col("text")) > 0)
      Multimodal.decodeAudioFeatures(
        Multimodal.audioFromDocuments(docs, sampleRate = 8000))
        .toDF()
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          col("amp_sum"), col("amp_max"))
        .orderBy("media_id")
    }),

    // REAL video decode: each doc's text bytes become the luma planes
    // of a genuine YUV4MPEG2 stream (8×8 mono frames, zero-padded),
    // decoded back by the Y4M parser (header, FRAME markers, plane
    // walk). Frame counts and luma stats are exact integer functions
    // of the text, so DuckDB verifies a real encode→decode round trip.
    "m4_video_decode" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(length(col("text")) > 0)
      Multimodal.decodeVideoFeatures(
        Multimodal.videosFromDocuments(docs, width = 8, height = 8))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          col("n_frames"), col("luma_sum"), col("luma_max"))
        .orderBy("media_id")
    }),
    // REAL frame sampling: every 2nd frame of each genuine Y4M
    // stream, one feature row per sampled frame (the training-data
    // "frame subsample" stage). Each 8×8 mono frame covers a 64-byte
    // slice of the text, so per-frame luma stats are exact integer
    // functions of that slice and DuckDB replays the sampling
    // closed-form.
    "m6_frame_sample" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(length(col("text")) > 0)
      Multimodal.sampleVideoFrames(
        Multimodal.videosFromDocuments(docs, width = 8, height = 8),
        stride = 2)
        .toDF()
        .select(col("media_id"), col("frame_no"), col("luma_sum"),
          col("luma_max"))
        .orderBy("media_id", "frame_no")
    })
  )

  val oracle: Map[String, String] = Map(
    "m1_binary_meta" -> """
      |SELECT doc_id AS media_id,
      | octet_length(encode(text))::BIGINT AS n_bytes,
      | sha256(text) AS sha256,
      | CAST(floor(list_reduce(list_prepend(0::BIGINT,
      |   list_transform(range(1, len(text) + 1),
      |    i -> ascii(substr(text, i, 1)))), (a, b) -> a + b)
      |  * 10000.0 / len(text) + 0.5) AS BIGINT) AS mean_byte_e4
      |FROM documents WHERE len(text) > 0 ORDER BY media_id""".stripMargin,

    // documents are pure ASCII (byte ops == char ops): pixel sum =
    // sum of character codes (padding zeros contribute nothing),
    // pixel max = max character code, height = ceil(len/16).
    "m2_image_decode" -> """
      |SELECT doc_id AS media_id,
      | 16 AS width,
      | CAST(ceil(len(text) / 16.0) AS INTEGER) AS height,
      | list_reduce(list_prepend(0::BIGINT,
      |   list_transform(range(1, len(text) + 1),
      |    i -> ascii(substr(text, i, 1)))), (a, b) -> a + b) AS px_sum,
      | CAST(list_max(list_transform(range(1, len(text) + 1),
      |    i -> ascii(substr(text, i, 1)))) AS INTEGER) AS px_max
      |FROM documents WHERE len(text) > 0 ORDER BY media_id""".stripMargin,

    // resized (r, c) samples the source at (2r, 2c): source index
    // 32r + 2c into the 16-wide zero-padded raster — a char code
    // when < len, else padding 0. height = ceil(ceil(len/16) / 2),
    // width = 8; padding never wins the max (ASCII > 0, len > 0 ⇒
    // pixel (0,0) is a real char).
    "m5_image_resize" -> """
      |SELECT doc_id AS media_id, 8 AS width,
      | CAST(ceil(ceil(len(text) / 16.0) / 2.0) AS INTEGER) AS height,
      | list_reduce(list_prepend(0::BIGINT, list_transform(
      |   range(0, 8 * CAST(ceil(ceil(len(text) / 16.0) / 2.0)
      |     AS BIGINT)),
      |   p -> CASE WHEN 32 * (p // 8) + 2 * (p % 8) < len(text)
      |     THEN ascii(substr(text, 32 * (p // 8) + 2 * (p % 8) + 1, 1))
      |     ELSE 0 END)), (a, b) -> a + b) AS px_sum,
      | CAST(list_max(list_transform(
      |   range(0, 8 * CAST(ceil(ceil(len(text) / 16.0) / 2.0)
      |     AS BIGINT)),
      |   p -> CASE WHEN 32 * (p // 8) + 2 * (p % 8) < len(text)
      |     THEN ascii(substr(text, 32 * (p // 8) + 2 * (p % 8) + 1, 1))
      |     ELSE 0 END)) AS INTEGER) AS px_max
      |FROM documents WHERE len(text) > 0 ORDER BY media_id""".stripMargin,

    // sample i = (ascii_i − 128) << 8; documents are ASCII (< 128), so
    // |sample| = (128 − ascii) * 256: amp_sum = 256·Σ(128−ascii),
    // amp_max = 256·(128 − min ascii), n_samples = len(text).
    "m3_audio_decode" -> """
      |SELECT doc_id AS media_id, 8000 AS sample_rate,
      | len(text)::BIGINT AS n_samples,
      | (256 * list_reduce(list_prepend(0::BIGINT,
      |   list_transform(range(1, len(text) + 1),
      |    i -> 128 - ascii(substr(text, i, 1)))), (a, b) -> a + b)
      |  )::BIGINT AS amp_sum,
      | CAST(256 * (128 - list_min(list_transform(range(1, len(text) + 1),
      |    i -> ascii(substr(text, i, 1))))) AS INTEGER) AS amp_max
      |FROM documents WHERE len(text) > 0 ORDER BY media_id""".stripMargin,

    // frame f covers text bytes [64f, 64f+64); the last frame is
    // zero-padded (padding adds nothing, never wins the max since
    // ASCII > 0 and every sampled frame contains ≥ 1 real char)
    "m6_frame_sample" -> """
      |WITH f AS (SELECT doc_id, text,
      |  unnest(range(0, CAST(ceil(len(text) / 64.0) AS BIGINT)))
      |   AS fr
      | FROM documents WHERE len(text) > 0)
      |SELECT doc_id AS media_id, fr::INTEGER AS frame_no,
      | list_reduce(list_prepend(0::BIGINT, list_transform(
      |   range(64 * fr + 1, least(64 * fr + 64, len(text)) + 1),
      |   i -> ascii(substr(text, i, 1)))), (a, b) -> a + b)
      |  AS luma_sum,
      | CAST(list_max(list_transform(
      |   range(64 * fr + 1, least(64 * fr + 64, len(text)) + 1),
      |   i -> ascii(substr(text, i, 1)))) AS INTEGER) AS luma_max
      |FROM f WHERE fr % 2 = 0 ORDER BY 1, 2""".stripMargin,

    // 8×8 mono frames: n_frames = ceil(len/64); padding zeros add
    // nothing to the luma sum and never win the max (ASCII > 0).
    "m4_video_decode" -> """
      |SELECT doc_id AS media_id, 8 AS width, 8 AS height,
      | CAST(ceil(len(text) / 64.0) AS INTEGER) AS n_frames,
      | list_reduce(list_prepend(0::BIGINT,
      |   list_transform(range(1, len(text) + 1),
      |    i -> ascii(substr(text, i, 1)))), (a, b) -> a + b) AS luma_sum,
      | CAST(list_max(list_transform(range(1, len(text) + 1),
      |    i -> ascii(substr(text, i, 1)))) AS INTEGER) AS luma_max
      |FROM documents WHERE len(text) > 0 ORDER BY media_id""".stripMargin
  )
}
