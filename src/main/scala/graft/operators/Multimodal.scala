package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Media row: opaque binary payload + typed metadata. */
case class MediaMeta(width: Int, height: Int, durationMs: Long, codec: String)
case class MediaRow(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                         features: Array[Float])
case class MediaFrame(media_id: Long, frame_idx: Int, offset_ms: Long)

/** Multimodal columns for the training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata, processed by batched
  * executor-side functions.
  *
  * The DECODE STEP IS A STUB (`decodeStub`): the real implementation
  * would hand each batch to an image/audio library (unavailable in this
  * environment). Everything around it — the schema, the typed Dataset
  * plumbing, partition-balanced batch shape, the frame-sampling
  * generator — is real and tested; swapping the stub for a JNI/library
  * call changes no plan shape.
  *
  * Scale notes: decode is embarrassingly parallel; `repartitionByBytes`
  * balances skewed payload sizes before the expensive step so no
  * executor gets all the 4K videos. mapPartitions keeps per-batch setup
  * (model load, library init) amortized across rows — the Scala analog
  * of pandas-batched UDFs.
  */
object Multimodal {

  /** Deterministic fake feature extractor — STUB for a real decoder.
    * Folds the payload bytes into `dim` float accumulators; stands in
    * for decode→embed while exercising identical dataflow. */
  def decodeStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    acc
  }

  /** Build a media table from the documents testdata (payload = utf-8
    * bytes; kind round-robins image/audio/video) — plumbing fixture. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("content"),
        struct(
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") % 480).cast("int").as("height"),
          (col("n_chars") * 100).as("durationMs"),
          lit("fake").as("codec")).as("meta"))
      .as[MediaRow]
  }

  /** Rebalance so total payload bytes per partition are even — decode
    * cost follows bytes, not row counts (skew guard for the expensive
    * stage). */
  def repartitionByBytes(ds: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] =
    ds.repartitionByRange(partitions, expr("length(content)"), expr("media_id"))

  /** Batched feature extraction: one pass per partition, library-init
    * cost amortized (the `libraryHandle` val stands where a real decoder
    * would be initialized once per batch). */
  def extractFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val libraryHandle = new Object // per-partition init point (stub)
      val _ = libraryHandle
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.content.length,
          decodeStub(m.content))
      }
    }
  }

  /** Deterministic frame sampling for video rows: one frame every
    * `everyMs` of metadata duration (generator-shaped; no decode). */
  def sampleFrames(ds: Dataset[MediaRow], everyMs: Long): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video").flatMap { m =>
      val n = math.max(1L, m.meta.durationMs / everyMs)
      (0L until math.min(n, 64L)).map(i => MediaFrame(m.media_id, i.toInt, i * everyMs))
    }
  }

  /** Metadata-only resize: pure column transform, no payload touch. */
  def resizeMeta(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("meta", struct(
      lit(w).as("width"), lit(h).as("height"),
      col("meta.durationMs").as("durationMs"), col("meta.codec").as("codec")))
}
