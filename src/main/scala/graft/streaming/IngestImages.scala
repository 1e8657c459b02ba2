package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous IMAGE near-dup dedup of an unbounded feed — the THIRD
  * dedup channel's ingest gate (IngestDedup resolves content text,
  * IngestFuzzy resolves typo keys; this resolves the image payload by
  * perceptual hash): drop any incoming record whose image dHash is
  * within `maxHamming` of an already-kept image (or of a smaller-id
  * image in the same batch, the first-wins cascade), keep the rest,
  * remember the survivors' fingerprints.
  *
  * This is the single-part instantiation of the generic
  * [[IngestFingerprints]] gate (fingerprint fn = `Multimodal.dHash64`,
  * one part per record) — banding layout, store geometry, broadcast
  * probe shape, and delivery semantics are all the shared gate's; see
  * its scaladoc. Kept as a named channel so the composed pipeline and
  * existing callers keep the (id, h) fingerprint face.
  *
  * Input columns: doc_id (globally unique) + a binary image column
  * (`imageCol`); rows with a null or undecodable image match nothing
  * and always survive. */
object IngestImages {

  /** Create the store at `path` from an existing fingerprint corpus
    * (possibly empty): (id: long, h: long) rows. */
  def dhashSave(spark: SparkSession, hashes: DataFrame, path: String,
                maxHamming: Int, blockChoose: Int = 3): Unit =
    IngestFingerprints.fpSave(spark,
      hashes.select(col("id"), lit(0).as("p"), col("h")),
      path, maxHamming, blockChoose)

  /** Run one micro-batch of the gate: survivors append to `outPath`,
    * their fingerprints to the store. Returns kept rows. */
  def processBatch(batch: DataFrame, storePath: String, outPath: String,
                   imageCol: String = "image"): Long = {
    val (kept, keptHashes, release) = gateBatch(batch, storePath, imageCol)
    val nKept = kept.count()
    // refreshByPath order: the out write consumes the store-reading
    // frame first, the store grows last
    kept.write.mode("append").parquet(outPath)
    appendHashes(batch.sparkSession, storePath, keptHashes)
    release()
    nKept
  }

  /** Append already-gated fingerprints (id, h) to the store — public
    * so the composed pipeline can gate, fan out its sinks, and grow
    * this store in the refreshByPath-safe slot. */
  def appendHashes(spark: SparkSession, storePath: String,
                   hashes: DataFrame): Unit =
    IngestFingerprints.appendFps(spark, storePath,
      hashes.select(col("id"), lit(0).as("p"), col("h")))

  /** The gate half: (kept rows with ALL input columns, survivors'
    * fingerprint rows (id, h), release hook). Nothing is written. */
  def gateBatch(batch: DataFrame, storePath: String,
                imageCol: String = "image")
      : (DataFrame, DataFrame, () => Unit) = {
    val (kept, keptFps, release) = IngestFingerprints.gateBatch(
      batch, storePath, IngestFingerprints.imageFps(batch, imageCol))
    (kept, keptFps.select("id", "h"), release)
  }

  /** Start the streaming gate: `docs` carries doc_id + `imageCol`
    * (+ anything else); pre-seed the store with `dhashSave` (possibly
    * of an empty frame) to fix the banding layout. */
  def start(docs: DataFrame, storePath: String, outPath: String,
            checkpoint: String, imageCol: String = "image",
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    IngestFingerprints.start(docs, storePath, outPath, checkpoint,
      IngestFingerprints.imageFps(_, imageCol), trigger)

  def compactKept(spark: SparkSession, outPath: String): Long =
    IngestFingerprints.compactKept(spark, outPath)

  def compactStore(spark: SparkSession, storePath: String): Long =
    IngestFingerprints.compactStore(spark, storePath)
}
