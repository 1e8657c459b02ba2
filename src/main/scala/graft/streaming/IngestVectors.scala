package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, length, size}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Continuous embedding ingest into a persisted IVF index — the vector
  * half of `IngestDedup`: an unbounded feed of (vec_id, embedding) rows
  * lands batch by batch in the parquet list store that
  * `Similarity.ivfSave` wrote and `ivfLoad` serves, so the searchable
  * index grows while queries keep running from reloads. Reference
  * analog: the same append-accumulate ingest loop
  * (freshness/storage.py:85-151), applied to an ANN index instead of a
  * kept-document set.
  *
  * Each micro-batch is ONE `Similarity.ivfAppendSave` call: assign the
  * batch against the saved (frozen) centroids — broadcast, no list
  * scan, no refit — and append the assigned rows to the partitioned
  * store. Per-batch cost is O(batch), independent of the store size;
  * the quantizer refits only when drift demands it (rebuild + `ivfSave`
  * to a new path, the offline path). Works for float and SQ8 stores
  * alike — `ivfAppendSave` re-encodes per batch based on the store's
  * own schema.
  *
  * Delivery: restart replays the in-flight micro-batch, so the store
  * is at-least-once — searches tolerate the duplicate rows (same vid,
  * same list ⇒ same cosine; rank ties collapse on vid), and a
  * compaction pass can drop exact (vid, list_id) duplicates offline.
  * Input columns: vec_id, embedding.
  */
object IngestVectors {

  /** Run one micro-batch: append the batch to whichever saved index
    * layout lives at `indexPath` — detected from the store's own
    * directory shape, so one ingest loop serves every tier:
    * `assigned/` = IVF (float, SQ8, or 1-bit — `ivfAppendSave`
    * re-encodes from the store schema); `rot/` + `centroids/` = OPQ,IVF,PQ (batch
    * rides the frozen rotation, then the frozen lists/books);
    * `books/` + `centroids/` = IVF,PQ; `books/` + `rot/` = flat OPQ;
    * `books/` alone = flat PQ; `bincodes/` = the 1-bit sign store
    * (`binSave`, Hamming-ranked search face). Returns the batch row
    * count. Factored out of the foreachBatch closure so batch specs
    * can drive it without a streaming query. */
  def processBatch(batch: DataFrame, indexPath: String): Long = {
    val spark = batch.sparkSession
    val n = batch.count()
    if (n > 0) {
      // Hadoop FS, not java.io: index stores live on the cluster
      // filesystem (HDFS/object store) in production
      val root = new org.apache.hadoop.fs.Path(indexPath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val has = (d: String) => fs.exists(new org.apache.hadoop.fs.Path(root, d))
      if (has("assigned")) Similarity.ivfAppendSave(spark, indexPath, batch)
      else if (has("rot") && has("centroids"))
        Similarity.ivfOpqAppendSave(spark, indexPath, batch)
      else if (has("books") && has("centroids"))
        Similarity.ivfPqAppendSave(spark, indexPath, batch)
      else if (has("books") && has("rot"))
        Similarity.opqAppendSave(spark, indexPath, batch)
      else if (has("books")) Similarity.pqAppendSave(spark, indexPath, batch)
      else if (has("bincodes")) Similarity.binAppendSave(spark, indexPath, batch)
      else throw new IllegalArgumentException(
        s"$indexPath is not an ivfSave/ivfPqSave/ivfOpqSave/opqSave/pqSave/binSave store")
    }
    n
  }

  /** Search a batch of query vectors against whatever saved layout
    * lives at `indexPath` — the read face of the ingest loop and the
    * streaming half of online pair mining: each arriving batch can
    * mine its top-k neighbors among EVERYTHING INGESTED SO FAR in
    * O(batch · nProbe · clusterRows) (IVF tiers) or O(batch · m·kSub +
    * batch · codes) ADC (flat PQ/OPQ), never touching kept text and
    * never rescanning the corpus. Same directory-shape dispatch as
    * `processBatch`; `nProbe` applies to the IVF layouts. Returns
    * (qid, rnk, vid), materialized so the loaded store is released
    * before returning — callers sink it and unpersist.
    *
    * `scanFrac` is the recall-stable dial for LONG-LIVED callers (the
    * ingest loop's pair mining): a fixed `nProbe` silently shrinks the
    * scanned share of the corpus when a maintenance rebuild grows
    * nList with the store (the SCALE.md round-6 law, 0.88 → 0.29
    * recall across an 8× growth). When set, the effective probe count
    * is ⌈nList·scanFrac⌉ AGAINST THE STORE'S OWN CURRENT nList — read
    * from the loaded generation, so recall tracks the same corpus
    * fraction across generation swaps with no caller-side re-tuning.
    * Ignored by the flat PQ/OPQ layouts (they ADC-scan every code;
    * there is no list dial to hold). */
  def searchBatch(queries: DataFrame, indexPath: String, k: Int,
                  nProbe: Int = 2,
                  scanFrac: Option[Double] = None): DataFrame = {
    val spark = queries.sparkSession
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val has = (d: String) => fs.exists(new org.apache.hadoop.fs.Path(root, d))
    def probes(nList: Int): Int = scanFrac
      .map(f => math.max(1, math.ceil(nList * f).toInt)).getOrElse(nProbe)
    // BinHamming min-clamps mismatched code lengths (the DotProduct
    // discipline), so a query dim that differs from the store's code
    // width would yield a truncated-but-plausible ranking with no
    // error anywhere. In the ingest path that is always a
    // misconfiguration — fail loudly before searching. One limit-1
    // scan per side; skipped when either side is empty.
    def requireBinDim(codes: DataFrame): Unit = {
      val storeLen = codes.select(length(col("bc"))).limit(1).collect()
      val qDim = queries.select(size(col("embedding"))).limit(1).collect()
      if (storeLen.nonEmpty && qDim.nonEmpty) {
        val sl = storeLen(0).getInt(0)
        val qd = qDim(0).getInt(0)
        require((qd + 7) / 8 == sl,
          s"query embedding dim $qd encodes to ${(qd + 7) / 8}-byte sign " +
            s"codes but the store at $indexPath holds $sl-byte codes — " +
            "store/query dimensionality mismatch")
      }
    }
    val (res, release): (DataFrame, () => Unit) =
      if (has("assigned")) {
        val idx = Similarity.ivfLoad(spark, indexPath)
        val r =
          if (idx.assigned.columns.contains("bc")) {
            requireBinDim(idx.assigned)
            Similarity.ivfSearchBin(idx, queries, k, probes(idx.nList))
          }
          else if (idx.assigned.columns.contains("qc"))
            Similarity.ivfSearchSq8(idx, queries, k, probes(idx.nList))
          else Similarity.ivfSearch(idx, queries, k, probes(idx.nList))
        (r, () => idx.release())
      } else if (has("rot") && has("centroids")) {
        val idx = Similarity.ivfOpqLoad(spark, indexPath)
        (Similarity.ivfOpqSearch(idx, queries, k, probes(idx.pq.nList)),
          () => idx.release())
      } else if (has("books") && has("centroids")) {
        val idx = Similarity.ivfPqLoad(spark, indexPath)
        (Similarity.ivfPqSearch(idx, queries, k, probes(idx.nList)),
          () => idx.release())
      } else if (has("books") && has("rot")) {
        val idx = Similarity.opqLoad(spark, indexPath)
        (Similarity.opqSearch(idx, queries, k), () => idx.release())
      } else if (has("books")) {
        val idx = Similarity.pqLoad(spark, indexPath)
        (Similarity.pqSearch(idx, queries, k), () => idx.release())
      } else if (has("bincodes")) {
        val idx = Similarity.binLoad(spark, indexPath)
        requireBinDim(idx.coded)
        (Similarity.binSearch(idx, queries, k), () => idx.release())
      } else throw new IllegalArgumentException(
        s"$indexPath is not an ivfSave/ivfPqSave/ivfOpqSave/opqSave/pqSave/binSave store")
    val out = res.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    release()
    out
  }

  /** Skew-gated offline maintenance for an `ivfSave` IVF store — the
    * companion the append-only loop needs eventually: frozen centroids
    * keep per-batch cost O(batch) but let a drifted feed pile new
    * regions into few lists. Measures on-disk occupancy skew
    * (`Similarity.ivfSkew`); above `maxSkew`, retrains and writes the
    * rebalanced generation to `dstPath` and returns true — the caller
    * (an ingest supervisor) swaps readers to the new path at its own
    * pace while the at-least-once ingest keeps appending to the OLD
    * path until the swap. The rebuild works from the `ivfLoad`
    * SNAPSHOT, so batches that land on the old path mid-rebuild would
    * be absent from the new generation — before returning, this
    * replays them via `Similarity.ivfReplayGap` (vid anti-join old →
    * new, reconstruct from the old store's own truth, frozen-centroid
    * append). Batches that land AFTER this returns and BEFORE the
    * reader swap are the supervisor's half of the contract: call
    * `ivfReplayGap(old, new)` once more at swap time — it is
    * idempotent and O(gap). Below the threshold: one nList-row
    * aggregation, nothing written, false. IVF float/SQ8 stores only
    * (the PQ tiers refit codebooks via their own build path).
    *
    * `targetClusterRows` adds the GROWTH gate the append-only loop
    * needs alongside the skew gate: frozen nList means mean list
    * occupancy — and with it every probe's scan cost — grows linearly
    * with the store (the round-7 pairmine law, per-batch 43.9 → 80 s
    * over an 8× store). When set, maintenance also fires once mean
    * occupancy exceeds 2× the target, and the new generation gets
    * nList = ⌈store / targetClusterRows⌉ (the `autoK` law), restoring
    * fixed-`nProbe` probe cost to ~nProbe·target rows. Callers that
    * must hold RECALL rather than cost pass `scanFrac` to
    * `searchBatch` — the two dials are the two sides of the same
    * tradeoff. `sampleFit` routes the retrain through the bounded
    * driver coarse fit (`ivfBuild(sampleFit = true)`) so maintenance
    * cost does not itself scale as store×nList. */
  def maintainIndex(spark: org.apache.spark.sql.SparkSession,
                    indexPath: String, maxSkew: Double,
                    dstPath: String, targetClusterRows: Long = 0L,
                    sampleFit: Boolean = false): Boolean = {
    val idx = Similarity.ivfLoad(spark, indexPath)
    val r = Similarity.ivfListStats(idx)
      .agg(org.apache.spark.sql.functions.max(col("n_vecs")),
        org.apache.spark.sql.functions.sum(col("n_vecs"))).head()
    val total = if (r.isNullAt(1)) 0L else r.getLong(1)
    val skew =
      if (total == 0L) 1.0
      else r.getLong(0).toDouble / (total.toDouble / idx.nList)
    val meanOcc = if (idx.nList == 0) 0.0 else total.toDouble / idx.nList
    val grown = targetClusterRows > 0L && meanOcc > 2.0 * targetClusterRows
    if (skew > maxSkew || grown) {
      val k =
        if (targetClusterRows > 0L)
          math.max(idx.nList,
            math.ceil(total.toDouble / targetClusterRows).toInt)
        else idx.nList
      val reb = Similarity.ivfRebalance(idx, k, sampleFit) // releases idx
      Similarity.ivfSave(reb, dstPath)
      reb.release()
      // close the mid-rebuild append window (no-op when nothing landed)
      Similarity.ivfReplayGap(spark, indexPath, dstPath)
      true
    } else {
      idx.release()
      false
    }
  }

  /** First-class supervisor for a maintained IVF store — the loop the
    * `maintainIndex` scaladoc prescribes, owned as state instead of
    * left to the caller: it tracks the CURRENT generation path, runs
    * gates after append bursts, and performs the swap contract
    * (rebuild → its internal gap replay → one more idempotent
    * `ivfReplayGap` at swap → readers move to the new path). The
    * round-8 sf10 campaign measured the payoff: per-batch pair-mining
    * cost flat at 38–43 s across an 8× store where the frozen
    * quantizer grows 43 → 87 s, with 10–19 s rebalances on the
    * maintenance cadence (SCALE.md round 8).
    *
    * Generations land under `genDir/gen<N>`; old generations are left
    * on disk for readers still draining them (delete on the caller's
    * retention schedule). `maintain()` is safe to call between any two
    * batches — or from a separate maintenance thread, because appends
    * that land on the old path after the rebuild snapshot are replayed
    * into the new generation before the path swap, the at-least-once
    * store tolerates the (vid, list) duplicates a racing append can
    * leave (compaction reclaims them), and the one remaining
    * concurrent-mode window — an appender that read `currentPath`
    * BEFORE a swap and finished its write AFTER the swap's final
    * replay, landing vectors on the retired generation — is closed by
    * the NEXT maintain(), which starts with one more idempotent
    * `ivfReplayGap(previousGeneration, current)` before gate-checking
    * (O(gap): a vid anti-join over the old lists, never a refit).
    * Callers that retire the supervisor while such an appender may
    * still be in flight should call `catchUp()` once after the last
    * append completes. */
  final class IndexSupervisor(spark: org.apache.spark.sql.SparkSession,
                              initialPath: String, genDir: String,
                              maxSkew: Double = 2.0,
                              targetClusterRows: Long = 0L,
                              sampleFit: Boolean = true) {
    @volatile private var cur = initialPath
    @volatile private var prev: String = null
    @volatile private var gen = 0
    def currentPath: String = cur
    def generation: Int = gen
    /** Replay any vectors a straggling appender left on the PREVIOUS
      * generation into the current one (idempotent, O(gap), no-op
      * before the first swap). Called automatically at the start of
      * every `maintain()`; exposed for callers retiring the supervisor
      * with appends possibly still in flight. */
    def catchUp(): Long = synchronized {
      if (prev == null) 0L
      else graft.operators.Similarity.ivfReplayGap(spark, prev, cur)
    }
    /** Gate-check the current generation; on a rebuild, replay the
      * append gap and swap. Returns true when a swap happened. */
    def maintain(): Boolean = synchronized {
      // close the previous swap's straggler window first: an appender
      // that read the old currentPath before the swap and landed its
      // write after the final replay would otherwise be lost silently
      catchUp()
      val dst = s"$genDir/gen${gen + 1}"
      if (IngestVectors.maintainIndex(spark, cur, maxSkew, dst,
          targetClusterRows, sampleFit)) {
        // the supervisor's half of the contract: close the window
        // between maintainIndex's return and this swap (idempotent)
        graft.operators.Similarity.ivfReplayGap(spark, cur, dst)
        prev = cur
        cur = dst
        gen += 1
        true
      } else false
    }
  }

  /** Start the streaming vector ingest against an existing `ivfSave`d
    * index. Default trigger is a continuous micro-batch loop; pass
    * `Trigger.AvailableNow()` for a one-shot backfill (same
    * availability-snapshot caveat as `IngestDedup.start`). */
  def start(vecs: DataFrame, indexPath: String, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    vecs.select(col("vec_id"), col("embedding")).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, indexPath)
        ()
      }
      .start()
}
