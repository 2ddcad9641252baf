package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches —
  * the Scala face of the mapInPandas pattern (north-star requirement).
  *
  * The actual codec step is a DETERMINISTIC STUB (`decodeStub`): no
  * image/audio libraries ship in this build, so "decode" derives
  * features from the bytes themselves (length, digest, mean,
  * frame-stride samples). The Spark-side plumbing — schema, typed
  * Dataset, partition-batched iteration, feature struct shape — is
  * real and is what a production codec would plug into.
  *
  * Scale: mapPartitions keeps per-row overhead amortized (one codec
  * context per partition, like one Arrow batch per mapInPandas call);
  * binary payloads never shuffle — features are extracted in the scan
  * stage and only the small feature rows move.
  */
object Multimodal {

  case class Media(media_id: Long, media_type: String,
    content: Array[Byte], width: Int, height: Int)

  case class MediaFeatures(media_id: Long, media_type: String,
    n_bytes: Long, sha256: String, mean_byte_e4: Long, n_frames: Int)

  /** STUB decode: stands in for a real image/audio decoder.
    * Deterministic: features are pure functions of the payload. */
  private[multimodal] def decodeStub(m: Media, frameStride: Int)
    : MediaFeatures = {
    val bytes = m.content
    val digest = MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString
    val mean =
      if (bytes.isEmpty) 0L
      else math.floor(bytes.map(b => (b & 0xff).toLong).sum
        * 10000.0 / bytes.length + 0.5).toLong
    MediaFeatures(m.media_id, m.media_type, bytes.length.toLong, digest,
      mean, if (frameStride <= 0) 0 else bytes.length / frameStride)
  }

  /** Feature extraction over a typed media Dataset; one decoder
    * "context" per partition (mapPartitions, not per-row map). */
  def extractFeatures(media: Dataset[Media], frameStride: Int = 1024)
    : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (codec context reuse)
      it.map(m => decodeStub(m, frameStride))
    }
  }

  /** Frame sampling stub: every `stride`-th byte stands in for a
    * decoded frame; returns (media_id, frame_no, frame_byte). */
  def sampleFrames(media: Dataset[Media], stride: Int)
    : DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.content.indices.by(stride).map { i =>
        (m.media_id, i / stride, m.content(i) & 0xff)
      }
    }.toDF("media_id", "frame_no", "frame_byte")
  }

  /** STUB resize: a real implementation decodes, scales, re-encodes;
    * the stub downsamples the payload by `factor` (every factor-th
    * byte), preserving id/type. Dims use ceiling division so a
    * nonempty payload never reports a 0×0 size (the 1-D byte stub
    * cannot keep bytes == width*height — a real codec would). */
  def resizeStub(media: Dataset[Media], factor: Int): Dataset[Media] = {
    require(factor > 0, s"factor must be positive, got $factor")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val out = m.content.indices.by(factor)
          .map(m.content).toArray
        def ceilDiv(d: Int) = (d + factor - 1) / factor
        Media(m.media_id, m.media_type, out,
          ceilDiv(m.width), ceilDiv(m.height))
      }
    }
  }

  /** Synthesize a media table from `documents` (text bytes as payload)
    * — gives the multimodal path real data to run over in tests. */
  def mediaFromDocuments(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("media_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("content"),
      lit(0).as("width"), lit(0).as("height"))
      .as[Media]
  }
}
