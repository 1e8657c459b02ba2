package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, length, lit, when}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup

/** Continuous FUZZY-KEY dedup of an unbounded feed — the streaming
  * runtime over `Dedup.fuzzyKeyGate`'s batch semantics: drop any
  * incoming record whose key is within Levenshtein distance `maxDist`
  * of an already-kept key (or of a smaller-id key in the same batch),
  * keep the rest, and remember the survivors. The typo-distance
  * sibling of `IngestDedup` (MinHash near-dup gate) for entity/URL/
  * title keys, where "duplicate" means d edits, not token overlap.
  *
  * State is a parquet PassJoin index, NOT Spark streaming state:
  *   keys/  (id, s)            — every kept key, for band + verify
  *   segs/  (lt, i, seg, tid)  — each kept key's d+1 own segments
  *                               (`Dedup.edIndexSegs`), the equi-join
  *                               side of every later batch's probe
  *   meta/  (max_dist, min_seg) — the layout the segments were cut
  *                               with; probes and appends must match
  *
  * Each micro-batch:
  *   1. drops keys matching the store — one `edProbeSegs(batch)` ⋈
  *      segs/ equi-join (+ the bounded short-band join) + thresholded
  *      levenshtein verify (`Dedup.edStorePairsIndexed`): kept history
  *      is never re-SEGMENTED, only re-read, and only the store's
  *      seg rows move through the one shuffle;
  *   2. drops keys matching a smaller id within the batch (the
  *      `sketchDrops` first-wins policy — self-join PassJoin on the
  *      batch alone, quadratic in SLICE size: batches above `maxKeys`
  *      are auto-split into id-ordered ≤ `maxKeys` slices and folded
  *      serially with bit-exact first-wins parity, so a
  *      corpus-fraction batch can never re-arm the round-9 in-batch
  *      quadratic);
  *   3. appends surviving DOCS (all input columns ride along) to the
  *      output parquet;
  *   4. appends survivors' keys to keys/ and their segment rows to
  *      segs/, so batch N+1 probes them.
  *
  * Segment layout is a function of (maxDist, minSeg) — both are fixed
  * at `fuzzySave` and recorded in meta/; appends and probes validate
  * against it (a mismatched probe would silently miss pairs, so it
  * throws instead).
  *
  * Delivery matches `IngestDedup`: both sinks are at-least-once. A
  * replayed batch re-finds its own keys in the store at distance 0 and
  * drops them — the gate output is idempotent; a crash between the out
  * write and the store append can duplicate out rows (never lose them),
  * and `compactKept` reclaims them offline. Input columns: doc_id plus
  * a string key column (`keyCol`, default "key"); doc_id is globally
  * unique by contract. */
object IngestFuzzy {

  /** Create the store at `path` from an existing kept-key corpus
    * (possibly empty): (id: long, s: string) rows. */
  def fuzzySave(spark: SparkSession, keys: DataFrame, path: String,
                maxDist: Int, minSeg: Int = 3): Unit = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(minSeg >= 1, "minSeg must be >= 1")
    import spark.implicits._
    val base = keys.where(col("s").isNotNull)
      .select(col("id").cast("long").as("id"), col("s"))
    base.write.mode("overwrite").parquet(s"$path/keys")
    Dedup.edIndexSegs(base.withColumn("len", length(col("s"))), maxDist, minSeg)
      .write.mode("overwrite").parquet(s"$path/segs")
    Seq((maxDist, minSeg)).toDF("max_dist", "min_seg")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  private def meta(spark: SparkSession, path: String): (Int, Int) = {
    require(exists(spark, s"$path/meta"),
      s"$path is not a fuzzySave store (missing meta/)")
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getInt(0), r.getInt(1))
  }

  /** Run one micro-batch of the gate against the store at `storePath`,
    * appending surviving docs to `outPath` and their keys + segment
    * rows to the store. Returns the number of surviving rows. Factored
    * out of the foreachBatch closure so batch specs can drive it.
    * Batches above `maxKeys` rows are auto-split (see `gateBatch`). */
  def processBatch(batch: DataFrame, storePath: String, outPath: String,
                   keyCol: String = "key", maxKeys: Int = 10000): Long = {
    val (kept, release) = gateBatch(batch, storePath, keyCol, maxKeys)
    val nKept = kept.count()
    // round-7 refreshByPath rule: every consumer of a frame that READS
    // the store runs before anything appends to the store — out first,
    // then keys/ + segs/
    kept.write.mode("append").parquet(outPath)
    appendKeys(batch.sparkSession, storePath,
      kept.where(col(keyCol).isNotNull)
        .select(col("doc_id").cast("long").as("id"), col(keyCol).as("s")))
    release()
    nKept
  }

  /** Append already-gated keys (id, s) to the store: one keys/ row and
    * d+1 segs/ rows per key, cut with the store's recorded layout.
    * Public so a composite pipeline (IngestPipeline) can gate with
    * `gateBatch`, fan the kept frame to its sinks, and grow the store
    * LAST — the refreshByPath ordering every state store follows. */
  def appendKeys(spark: SparkSession, storePath: String,
                 keys: DataFrame): Unit = {
    val (d, minSeg) = meta(spark, storePath)
    val k = keys.persist(StorageLevel.MEMORY_AND_DISK)
    k.count()
    k.write.mode("append").parquet(s"$storePath/keys")
    Dedup.edIndexSegs(k.withColumn("len", length(col("s"))), d, minSeg)
      .write.mode("append").parquet(s"$storePath/segs")
    k.unpersist(blocking = false)
  }

  /** The gate half of `processBatch`: the batch's surviving rows (ALL
    * input columns ride along) without writing anything, plus a
    * release hook. Null-key rows match nothing and always survive.
    *
    * Safe-by-default against the in-batch quadratic: the within-batch
    * self-join is quadratic in BATCH size on adversarial keys (round-9
    * measured ~8 min per 100 k-key batch at sf10, store-independent),
    * so batches above `maxKeys` rows are split into id-ordered slices
    * of ≤ `maxKeys` and folded serially — each slice probes the store
    * PLUS every earlier slice's keys (ALL of them, not just survivors:
    * the first-wins rule is a conservative cascade, a dropped
    * smaller-id key still drops its neighbors), which is exactly the
    * unsplit gate's decision for every key, so the output is
    * bit-identical at any `maxKeys` (pinned in IngestFuzzySpec). Slice
    * assignment uses the two-level global rank (never a bare
    * batch-wide window). Nothing is appended during the fold, so the
    * store read stays stable (the refreshByPath rule). */
  def gateBatch(batch: DataFrame, storePath: String,
                keyCol: String = "key",
                maxKeys: Int = 10000): (DataFrame, () => Unit) = {
    val (kept, release, _) = gateBatchStats(batch, storePath, keyCol, maxKeys)
    (kept, release)
  }

  /** `gateBatch` plus per-slice (keys, seconds) timings — the
    * instrumented form ScaleReport's fuzzygate campaign drives. */
  private[graft] def gateBatchStats(batch: DataFrame, storePath: String,
                                    keyCol: String, maxKeys: Int)
      : (DataFrame, () => Unit, Seq[(Long, Double)]) = {
    require(maxKeys >= 1, "maxKeys must be >= 1")
    val spark = batch.sparkSession
    val (d, minSeg) = meta(spark, storePath)
    val b = batch.persist(StorageLevel.MEMORY_AND_DISK)
    val n = b.count()
    val emptyBase = b.where(col(keyCol).isNotNull)
      .select(col("doc_id").cast("long").as("id"), col(keyCol).as("s"))
      .withColumn("len", length(col("s"))).limit(0)
    val (storeBase, storeSegs) =
      if (exists(spark, s"$storePath/keys")) {
        val sb = spark.read.parquet(s"$storePath/keys")
          .withColumn("len", length(col("s")))
        // segs/ can hold zero data files even when keys/ has them:
        // every kept key shorter than minSeg*(d+1)-d cuts NO segments
        // and Spark commits no part file for the empty append — reading
        // the bare directory dies on schema inference. Recut from the
        // keys (empty by construction in exactly that case).
        val segs =
          if (exists(spark, s"$storePath/segs"))
            spark.read.parquet(s"$storePath/segs")
          else Dedup.edIndexSegs(sb, d, minSeg)
        (sb, segs)
      } else // seeded-empty store: no data files yet, appends create them
        (emptyBase, Dedup.edIndexSegs(emptyBase, d, minSeg))
    // id-ordered slice assignment from DRIVER-SIDE quantile boundaries
    // — computed once, then pure literals in a projection over the
    // persisted batch, so every slice job sees the identical
    // assignment BY CONSTRUCTION. A rank-based assignment is NOT safe
    // here: the fold reads it from many separate jobs, and
    // globalRank's two references to its range-partitioned frame can
    // materialize as two concurrent AQE stages that each sample their
    // own boundaries — ranks and offsets then disagree, some ranks
    // overflow the slice range, and keys silently land in NO slice
    // (found as a flaky split-vs-unsplit parity break at 10 k+ keys;
    // single-query users like snmPairs reuse the one exchange and are
    // safe). Quantile error only skews slice SIZES a fraction of a
    // percent — slices stay id-ordered and disjoint-covering exactly,
    // which is all parity needs. Empty slices (duplicate boundaries)
    // fold through harmlessly.
    val nSlices = (((n max 1L) + maxKeys - 1) / maxKeys).toInt
    val sliced =
      if (nSlices <= 1) b.withColumn("__slice", lit(0))
      else {
        val probs = (1 until nSlices).map(_.toDouble / nSlices).toArray
        val bounds = b.select(col("doc_id").cast("double").as("d"))
          .stat.approxQuantile("d", probs, 0.001)
        val sliceCol = bounds.foldLeft(lit(0)) { (acc, bv) =>
          acc + when(col("doc_id").cast("double") > lit(bv), 1).otherwise(0)
        }
        b.withColumn("__slice", sliceCol.cast("int"))
      }
    // every persisted slice frame gets its LINEAGE CUT (a LogicalRDD
    // leaf over the materialized cache): without it, slice i's plan
    // embeds every prior slice's full tree several times over
    // (fuzzyKeyKept references its store side repeatedly), and the
    // resulting near-exponential plan STRING froze the sf10 campaign's
    // driver inside TreeNode.generateTreeString — rendered once per
    // job for the SQL-start event — before a single task was slow.
    // The cut frame still reads the cache; an evicted block recomputes
    // through the RDD lineage, so nothing ships through task results
    // (the round-3 localCheckpoint trap).
    def cut(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
    val keep = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val hold = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    var extraBase: DataFrame = null
    var extraSegs: DataFrame = null
    for (i <- 0 until nSlices) {
      val t0 = System.nanoTime
      val slice = sliced.where(col("__slice") === i).drop("__slice")
      val sliceBase0 = slice.where(col(keyCol).isNotNull)
        .select(col("doc_id").cast("long").as("id"), col(keyCol).as("s"))
        .withColumn("len", length(col("s")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nk = sliceBase0.count()
      val sliceBase = cut(sliceBase0)
      val (sb, ss) =
        if (extraBase == null) (storeBase, storeSegs)
        else (storeBase.unionByName(extraBase),
              storeSegs.unionByName(extraSegs))
      val keptIds = Dedup.fuzzyKeyKept(sliceBase, sb, d, minSeg, Some(ss))
        .select(col("id").as("doc_id"))
      val kept0 = slice.join(keptIds, Seq("doc_id"), "left_semi")
        .unionByName(slice.where(col(keyCol).isNull))
        .persist(StorageLevel.MEMORY_AND_DISK)
      kept0.count()
      keep += kept0
      hold += sliceBase0
      if (i < nSlices - 1) { // the last slice's keys probe nothing
        val segsI0 = Dedup.edIndexSegs(sliceBase, d, minSeg)
          .persist(StorageLevel.MEMORY_AND_DISK)
        segsI0.count()
        val segsI = cut(segsI0)
        hold += segsI0
        extraBase =
          if (extraBase == null) sliceBase else extraBase.unionByName(sliceBase)
        extraSegs =
          if (extraSegs == null) segsI else extraSegs.unionByName(segsI)
      }
      stats += ((nk, (System.nanoTime - t0) / 1e9))
    }
    val kept = keep.map(cut).reduce(_.unionByName(_))
    (kept, () => {
      b.unpersist(blocking = false)
      (keep ++ hold).foreach(_.unpersist(blocking = false))
    }, stats.toSeq)
  }

  /** Start the streaming gate: `docs` is an unbounded stream carrying
    * doc_id + `keyCol` (+ anything else); survivors land in `outPath`,
    * their keys/segments in the store at `storePath` (pre-seed with
    * `fuzzySave` — possibly of an empty frame — to fix the layout). */
  def start(docs: DataFrame, storePath: String, outPath: String,
            checkpoint: String, keyCol: String = "key",
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, storePath, outPath, keyCol)
        ()
      }
      .start()

  /** Offline compaction of the at-least-once sinks (the `IngestDedup`
    * contract: replay duplicates are bit-identical, dedup on id). */
  def compactKept(spark: SparkSession, outPath: String): Long =
    graft.core.Stores.rewriteDeduped(spark, outPath, Seq("doc_id"))

  def compactStore(spark: SparkSession, storePath: String): Long =
    graft.core.Stores.rewriteDeduped(spark, s"$storePath/keys", Seq("id")) +
      graft.core.Stores.rewriteDeduped(spark, s"$storePath/segs",
        Seq("tid", "lt", "i", "seg"))

  // strict: committed DATA files, not just _SUCCESS — a fuzzySave of an
  // EMPTY seed frame commits the directory with no part files (Spark
  // writes no file for an empty non-zero-partition frame), and reading
  // it would die on schema inference; treat it as the empty store.
  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(
      _.getPath.getName.endsWith(".parquet"))
  }
}
