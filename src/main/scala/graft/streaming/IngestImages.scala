package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_count, col}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.operators.{Dedup, Multimodal}

/** Continuous IMAGE near-dup dedup of an unbounded feed — the THIRD
  * dedup channel's ingest gate (IngestDedup resolves content text,
  * IngestFuzzy resolves typo keys; this resolves the image payload by
  * perceptual hash): drop any incoming record whose image dHash is
  * within `maxHamming` of an already-kept image (or of a smaller-id
  * image in the same batch, the first-wins cascade), keep the rest,
  * remember the survivors' fingerprints.
  *
  * State is a parquet fingerprint store, NOT Spark streaming state:
  *   hashes/ (id, h)                     — every kept 64-bit dHash
  *   meta/   (max_hamming, block_choose) — the banding layout probes
  *                                         and appends must match
  *
  * Each micro-batch: decode + dHash once per payload (mapPartitions),
  * then TWO banded Hamming joins (batch × store, batch × smaller-id
  * batch) with the SimHash pigeonhole's exact recall — never an
  * all-pairs compare, only matching (band, bkey) groups move. Rows
  * with a null or undecodable image match nothing and always survive
  * (the IngestFuzzy null-key passthrough: an accounting decision, not
  * a crash). Per-batch cost is O(batch × matching band keys); the
  * store is 16 bytes/image forever.
  *
  * Delivery matches the family: at-least-once sinks, a replayed batch
  * re-finds its own hashes at hamming 0 and drops itself (idempotent
  * out), crash between out write and store append duplicates rows
  * (never loses them) and `compact*` reclaims offline. Input columns:
  * doc_id (globally unique) + a binary image column (`imageCol`). */
object IngestImages {

  /** Create the store at `path` from an existing fingerprint corpus
    * (possibly empty): (id: long, h: long) rows. */
  def dhashSave(spark: SparkSession, hashes: DataFrame, path: String,
                maxHamming: Int, blockChoose: Int = 3): Unit = {
    import spark.implicits._
    require(maxHamming >= 0 && blockChoose >= 1 &&
      maxHamming + blockChoose <= 64, "banding must fit 64 bits")
    hashes.select(col("id").cast("long").as("id"), col("h"))
      .write.mode("overwrite").parquet(s"$path/hashes")
    Seq((maxHamming, blockChoose)).toDF("max_hamming", "block_choose")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def meta(spark: SparkSession, path: String): (Int, Int) = {
    require(exists(spark, s"$path/meta"),
      s"$path is not a dhashSave store (missing meta/)")
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getInt(0), r.getInt(1))
  }

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
                   hashes: DataFrame): Unit = {
    meta(spark, storePath) // layout must exist; validates the store
    hashes.select(col("id").cast("long").as("id"), col("h"))
      .write.mode("append").parquet(s"$storePath/hashes")
  }

  /** The gate half: (kept rows with ALL input columns, survivors'
    * fingerprint rows, release hook). Nothing is written. */
  def gateBatch(batch: DataFrame, storePath: String,
                imageCol: String = "image")
      : (DataFrame, DataFrame, () => Unit) = {
    val spark = batch.sparkSession
    import spark.implicits._
    val (d, bc) = meta(spark, storePath)
    val bh = batch.select(col("doc_id").cast("long").as("id"),
        col(imageCol).as("img"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, img) =>
        if (img == null) None
        else Multimodal.dHash64(img).map(h => (id, h))
      }).toDF("id", "h")
      .persist(StorageLevel.MEMORY_AND_DISK)
    bh.count()
    val store =
      if (exists(spark, s"$storePath/hashes"))
        spark.read.parquet(s"$storePath/hashes")
      else bh.limit(0)
    val bandB = Dedup.hammingBandRows(bh, 64, d, bc)
    val bandS = Dedup.hammingBandRows(store, 64, d, bc)
    // vs store: any match within the radius drops the batch row
    val dropsStore = bandB.as("x").join(bandS.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .where(bit_count(col("x.h").bitwiseXOR(col("y.h"))) <= d)
      .select(col("x.id").as("id"))
    // vs smaller-id batch rows: the conservative first-wins cascade
    // (a dropped smaller-id image still drops its neighbors — the
    // IngestFuzzy batch rule, which is what makes slice folds exact)
    val dropsBatch = bandB.as("x").join(bandB.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("y.id") < col("x.id"))
      .where(bit_count(col("x.h").bitwiseXOR(col("y.h"))) <= d)
      .select(col("x.id").as("id"))
    val drops = dropsStore.unionByName(dropsBatch).distinct()
      .withColumnRenamed("id", "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    drops.count()
    val kept = batch.join(drops, Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    kept.count()
    val keptHashes = bh.join(drops.select(col("doc_id").as("id")),
      Seq("id"), "left_anti")
    (kept, keptHashes, () => {
      bh.unpersist(blocking = false)
      drops.unpersist(blocking = false)
      kept.unpersist(blocking = false)
    })
  }

  /** Start the streaming gate: `docs` carries doc_id + `imageCol`
    * (+ anything else); pre-seed the store with `dhashSave` (possibly
    * of an empty frame) to fix the banding layout. */
  def start(docs: DataFrame, storePath: String, outPath: String,
            checkpoint: String, imageCol: String = "image",
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, storePath, outPath, imageCol)
        ()
      }
      .start()

  def compactKept(spark: SparkSession, outPath: String): Long =
    graft.core.Stores.rewriteDeduped(spark, outPath, Seq("doc_id"))

  def compactStore(spark: SparkSession, storePath: String): Long =
    graft.core.Stores.rewriteDeduped(spark, s"$storePath/hashes", Seq("id"))

  // committed DATA files, not just _SUCCESS (the IngestFuzzy rule)
  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(
      _.getPath.getName.endsWith(".parquet"))
  }
}
