package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_count, broadcast, col, count, countDistinct, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.operators.{Dedup, Multimodal}

/** ONE gate implementation for every 64-bit perceptual-fingerprint
  * channel (image dHash, audio energy aHash, video per-frame dHash):
  * the caller supplies a fingerprint function mapping a batch to
  * (id, p, h) rows — `p` a part index within the record — and the gate
  * drops an incoming record iff some already-kept record (or a
  * smaller-id record in the same batch, the first-wins cascade) has
  * the SAME part count and EVERY aligned part within `maxHamming`.
  * Single-part channels (images, audio: one hash per record, p = 0)
  * reduce exactly to the any-match-drops rule; the video channel's
  * all-frames rule (`Multimodal.videoNearDupPairs` semantics) is the
  * same predicate at np = frame count.
  *
  * State is a parquet fingerprint store, NOT Spark streaming state:
  *   hashes/ (id, p, h, np)               — every kept part hash plus
  *                                          its record's part count
  *   meta/   (max_hamming, block_choose)  — the banding layout probes
  *                                          and appends must match
  *
  * Scale shape (the IngestLinkage rule): the store side of the probe
  * is the corpus and must STREAM from parquet with no shuffle at any
  * size, so the batch-side band rows are broadcast EXPLICITLY — static
  * size estimates on persisted batch frames can't be trusted with that
  * decision, and micro-batch sizing (~10⁴ records) keeps the broadcast
  * a few MB. Per-batch cost is O(store scan + batch × matching band
  * keys); nothing store-sized is ever shuffled or exploded into a
  * shuffle. Banding is the SimHash pigeonhole (exact recall at the
  * radius, per aligned part).
  *
  * Records whose fingerprint fn yields NO parts (null / undecodable
  * payloads) match nothing and always survive — an accounting
  * decision, not a crash. Delivery matches the family: at-least-once
  * sinks, a replayed batch re-finds its own hashes at hamming 0 and
  * drops itself, crash between out write and store append duplicates
  * rows (never loses them), `compact*` reclaims offline. */
object IngestFingerprints {

  /** Batch → (id, p, h): one dHash row per decodable image payload. */
  def imageFps(batch: DataFrame, imageCol: String = "image"): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col("doc_id").cast("long").as("id"), col(imageCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, img) =>
        if (img == null) None
        else Multimodal.dHash64(img).map(h => (id, 0, h))
      }).toDF("id", "p", "h")
  }

  /** Batch → (id, p, h): one energy-envelope aHash row per decodable
    * audio payload (volume-invariant, `Multimodal.audioAHash64`). */
  def audioFps(batch: DataFrame, audioCol: String = "audio"): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col("doc_id").cast("long").as("id"), col(audioCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, audio) =>
        if (audio == null) None
        else Multimodal.audioAHash64(audio).map(h => (id, 0, h))
      }).toDF("id", "p", "h")
  }

  /** Batch → (id, p, h): one dHash row PER FRAME of each decodable
    * video payload, p = frame index — the frame-aligned multi-part
    * channel (two clips gate-match iff same frame count and every
    * aligned frame within the radius). */
  def videoFps(batch: DataFrame, videoCol: String = "video"): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col("doc_id").cast("long").as("id"), col(videoCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, video) =>
        if (video == null) Iterator.empty
        else Multimodal.aviDemux(video).iterator.flatMap {
          case (w, h, frames) => frames.iterator.zipWithIndex.map {
            case (f, i) => (id, i, Multimodal.frameDHash(f, w, h))
          }
        }
      }).toDF("id", "p", "h")
  }

  /** Create the store at `path` from an existing fingerprint corpus
    * (possibly empty): (id, p, h) rows — each id's parts COMPLETE in
    * the frame (np is derived per id). */
  def fpSave(spark: SparkSession, fps: DataFrame, path: String,
             maxHamming: Int, blockChoose: Int = 3): Unit = {
    import spark.implicits._
    require(maxHamming >= 0 && blockChoose >= 1 &&
      maxHamming + blockChoose <= 64, "banding must fit 64 bits")
    withNp(fps).write.mode("overwrite").parquet(s"$path/hashes")
    Seq((maxHamming, blockChoose)).toDF("max_hamming", "block_choose")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  // (id, p, h) → (id, p, h, np); the groupBy runs on batch-sized
  // frames only (fpSave seeds, appendFps deltas), never the store
  private def withNp(fps: DataFrame): DataFrame = {
    val typed = fps.select(col("id").cast("long").as("id"),
      col("p").cast("int").as("p"), col("h").cast("long").as("h"))
    typed.join(typed.groupBy("id").agg(count(lit(1)).cast("int").as("np")),
      Seq("id"))
      .select("id", "p", "h", "np")
  }

  private def meta(spark: SparkSession, path: String): (Int, Int) = {
    require(exists(spark, s"$path/meta"),
      s"$path is not an fpSave store (missing meta/)")
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getInt(0), r.getInt(1))
  }

  /** Run one micro-batch of the gate: survivors append to `outPath`,
    * their fingerprints to the store. Returns kept rows. */
  def processBatch(batch: DataFrame, storePath: String, outPath: String,
                   fps: DataFrame): Long = {
    val (kept, keptFps, release) = gateBatch(batch, storePath, fps)
    val nKept = kept.count()
    // refreshByPath order: the out write consumes the store-reading
    // frame first, the store grows last
    kept.write.mode("append").parquet(outPath)
    appendFps(batch.sparkSession, storePath, keptFps)
    release()
    nKept
  }

  /** Append already-gated fingerprints (id, p, h) to the store — each
    * id's parts complete in the frame. Public so a composed pipeline
    * can gate, fan out its sinks, and grow this store in the
    * refreshByPath-safe slot. */
  def appendFps(spark: SparkSession, storePath: String,
                fps: DataFrame): Unit = {
    meta(spark, storePath) // layout must exist; validates the store
    withNp(fps).write.mode("append").parquet(s"$storePath/hashes")
  }

  /** The gate half: (kept rows with ALL input columns, survivors'
    * fingerprint rows (id, p, h), release hook). Nothing is written.
    * `fps` is the caller-computed fingerprint frame for THIS batch
    * ((id, p, h), ids = doc_id values, parts complete per id). */
  def gateBatch(batch: DataFrame, storePath: String, fps: DataFrame)
      : (DataFrame, DataFrame, () => Unit) = {
    val spark = batch.sparkSession
    val (d, bc) = meta(spark, storePath)
    val bh = withNp(fps).persist(StorageLevel.MEMORY_AND_DISK)
    bh.count()
    val store =
      if (exists(spark, s"$storePath/hashes"))
        spark.read.parquet(s"$storePath/hashes")
      else bh.limit(0)
    val dropsStore = storeProbe(bh, store, d, bc)
    // vs smaller-id batch rows: the conservative first-wins cascade
    // (a dropped smaller-id record still drops its neighbors — the
    // IngestFuzzy batch rule, which is what makes slice folds exact)
    val bandB = Dedup.hammingBandRows(bh, 64, d, bc,
      carry = Seq("p", "np"), hint = false)
    val dropsBatch = dropIds(bandB.as("x")
      .join(bandB.as("y"), alignOn && col("y.id") < col("x.id"), "inner"), d)
    val drops = dropsStore.unionByName(dropsBatch).distinct()
      .withColumnRenamed("id", "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    drops.count()
    val kept = batch.join(drops, Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    kept.count()
    val keptFps = bh.join(drops.select(col("doc_id").as("id")),
      Seq("id"), "left_anti").select("id", "p", "h")
    (kept, keptFps, () => {
      bh.unpersist(blocking = false)
      drops.unpersist(blocking = false)
      kept.unpersist(blocking = false)
    })
  }

  /** Batch ids dropped by the STORE probe — the corpus-scale join.
    * The batch-side band rows are broadcast EXPLICITLY so the store's
    * band rows stream from parquet with no shuffle at any store size
    * (the IngestLinkage rule: static estimates on persisted batch
    * frames can't be trusted with this decision). Aligned-part match:
    * same band bucket, same part index, same part count, xor within
    * radius — a record drops iff ALL its np parts matched the SAME
    * store record. Exposed private[graft] for the plan-shape pin. */
  private[graft] def storeProbe(bh: DataFrame, store: DataFrame,
                                d: Int, bc: Int): DataFrame = {
    val bandB = Dedup.hammingBandRows(bh, 64, d, bc,
      carry = Seq("p", "np"), hint = false)
    val bandS = Dedup.hammingBandRows(store, 64, d, bc,
      carry = Seq("p", "np"), hint = false)
    dropIds(broadcast(bandB).as("x").join(bandS.as("y"), alignOn, "inner"), d)
  }

  private def alignOn: org.apache.spark.sql.Column =
    col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
      col("x.p") === col("y.p") && col("x.np") === col("y.np")

  // matched (x, y, p) triples (distinct across bands) → x ids whose
  // matched-part count against some single y reaches x's part count;
  // the aggregate runs on CANDIDATES only, never anything store-sized
  private def dropIds(joined: DataFrame, d: Int): DataFrame =
    joined.where(bit_count(col("x.h").bitwiseXOR(col("y.h"))) <= d)
      .select(col("x.id").as("id"), col("y.id").as("oid"),
        col("x.p").as("p"), col("x.np").as("np"))
      .groupBy("id", "oid", "np")
      .agg(countDistinct(col("p")).as("m"))
      .where(col("m") === col("np"))
      .select("id").distinct()

  /** Start the streaming gate: `docs` carries doc_id + the payload
    * column(s) `fpFn` reads; pre-seed the store with `fpSave` (possibly
    * of an empty frame) to fix the banding layout. */
  def start(docs: DataFrame, storePath: String, outPath: String,
            checkpoint: String, fpFn: DataFrame => DataFrame,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, storePath, outPath, fpFn(batch))
        ()
      }
      .start()

  def compactKept(spark: SparkSession, outPath: String): Long =
    graft.core.Stores.rewriteDeduped(spark, outPath, Seq("doc_id"))

  def compactStore(spark: SparkSession, storePath: String): Long =
    graft.core.Stores.rewriteDeduped(spark, s"$storePath/hashes",
      Seq("id", "p"))

  // committed DATA files, not just _SUCCESS (the IngestFuzzy rule)
  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(
      _.getPath.getName.endsWith(".parquet"))
  }
}
