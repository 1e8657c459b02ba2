package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** One end-to-end streaming curation ingest — the reference's
  * watch-loop analog (freshness/watch.py:24-34) lifted to the
  * training-data pipeline: a single unbounded feed of
  * (doc_id, text, embedding) rows drives, in ONE `foreachBatch` per
  * micro-batch,
  *
  *   1. the near-dup ingest gate — `IngestDedup.gateBatch` against the
  *      shared signature store (drops docs near-duplicating anything
  *      kept so far, or an earlier doc of the same batch);
  *   2. kept-document landing (`outPath` parquet append);
  *   3. signature-store growth (survivors' sketches only);
  *   4. vector-index append of the KEPT docs' embeddings —
  *      `IngestVectors.processBatch`, so every saved index layout
  *      (IVF float/SQ8, PQ, OPQ, IVF,PQ) grows by exactly the gated
  *      set;
  *   5. one per-batch quality telemetry row over the KEPT docs
  *      (`MonitorQuality.batchStats`);
  *   5b. optionally (`lexPath`, a `Lexical.lexSave` store) a lexical
  *      postings append of the KEPT docs — the BM25 serving index
  *      grows by exactly the gated set too, so dense (4) and lexical
  *      retrieval stay doc-for-doc consistent with the kept corpus;
  *   6. optionally (`vocabPath`, feed must carry `source`) per-source
  *      HLL vocabulary sketches of the KEPT docs (`IngestVocab`);
  *   7. optionally (`neighborsPath`) ONLINE PAIR MINING: each kept
  *      doc's top-`neighborK` neighbors among everything ingested
  *      BEFORE its batch (`IngestVectors.searchBatch` against the
  *      pre-append store, any saved layout), appended as
  *      (qid, rnk, vid, batch_id) rows — the streaming face of the
  *      corpus-wide `knnJoin`, O(batch) per batch. Prefer
  *      `neighborScanFrac` over the fixed `neighborProbe` when index
  *      maintenance may swap in a generation with more lists: the
  *      fraction is resolved against each generation's own nList
  *      (`IngestVectors.searchBatch`), so mining recall does not
  *      silently decay as the store grows.
  *
  * Because every sink is fed from the same persisted kept frame inside
  * one batch closure, the stores stay MUTUALLY CONSISTENT
  * batch-over-batch: kept parquet rows == appended index vectors ==
  * telemetry n_docs, batch by batch (pinned by `IngestPipelineSpec`,
  * including equality with running the three ingest loops separately).
  *
  * Scale stance is inherited from the parts: all state lives in
  * parquet (signatures ~0.5 KB/doc, index lists, one telemetry
  * row/batch), never in executor memory; per-batch cost is O(batch);
  * nothing ever rescans kept text. Delivery is at-least-once — a
  * replayed batch re-drops the same rows against the store, re-appends
  * a bit-identical telemetry row (collapsed by `MonitorQuality.report`),
  * and searches tolerate the index's duplicate (vid, list) rows — the
  * same stance as each standalone loop.
  *
  * The signature-store append running LAST also PICKS A FAILURE SIDE:
  * a crash after the sinks but before the store append makes the
  * replayed batch re-keep the same docs — DUPLICATES in out/index,
  * reclaimed offline by `IngestDedup.compactKept` /
  * `Similarity.ivfCompact`. The reverse order (store first) would make
  * the replay drop the batch against its own signatures and the sinks
  * silently LOSE it. Duplicates are recoverable; loss is not.
  */
object IngestPipeline {

  /** Run one micro-batch through gate → land → index → telemetry.
    * Returns the number of KEPT rows. Factored out of the foreachBatch
    * closure so batch specs can drive it without a streaming query.
    * An all-dropped batch writes nothing anywhere (the telemetry store
    * records batches with survivors; `kept == indexed == telemetry`
    * still holds trivially). */
  def processBatch(batch: DataFrame, batchId: Long, sigStorePath: String,
                   outPath: String, indexPath: String, telemetryPath: String,
                   threshold: Double, vocabPath: Option[String] = None,
                   neighborsPath: Option[String] = None,
                   neighborK: Int = 5, neighborProbe: Int = 2,
                   neighborScanFrac: Option[Double] = None,
                   lexPath: Option[String] = None): Long = {
    val (kept, keptSigs, release) =
      IngestDedup.gateBatch(batch, sigStorePath, threshold)
    val nKept = kept.count()
    if (nKept > 0) {
      // optional online pair mining: each KEPT doc's top-k neighbors
      // among everything ingested BEFORE this batch. Must run before
      // the index append both for its semantics (prior corpus only —
      // within-batch pairs are the offline knnJoin's job) and for the
      // refreshByPath rule (the search reads indexPath; appending
      // first would re-execute it against a store containing the
      // batch itself).
      neighborsPath.foreach { np =>
        val nb = IngestVectors.searchBatch(
          kept.select(col("doc_id").as("vec_id"), col("embedding")),
          indexPath, neighborK, neighborProbe, neighborScanFrac)
        nb.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append").parquet(np)
        nb.unpersist(blocking = false)
      }
      // ORDER MATTERS: the signature-store append must come LAST.
      // Writing to sigStorePath triggers refreshByPath, which recaches
      // every plan reading that path — including `kept` (its anti-join
      // reads the store through `drops`). A consumer of `kept` that
      // runs AFTER the store grows re-evaluates against a store
      // containing the batch's own signatures, every doc self-matches,
      // and the consumer silently sees an EMPTY kept set (found
      // empirically in round 7: vector appends vanished for every
      // batch after the first).
      kept.select(col("doc_id"), col("text"))
        .write.mode("append").parquet(outPath)
      IngestVectors.processBatch(
        kept.select(col("doc_id").as("vec_id"), col("embedding")), indexPath)
      MonitorQuality.batchStats(kept.select(col("doc_id"), col("text")), batchId)
        .coalesce(1).write.mode("append").parquet(telemetryPath)
      // optional 5th store: per-source vocabulary sketches of the KEPT
      // docs (requires a `source` column in the feed)
      vocabPath.foreach { vp =>
        IngestVocab.processBatch(
          kept.select(col("source"), col("text")), batchId, vp)
      }
      // optional 6th store: lexical postings of the KEPT docs (batch
      // token offset by 1 — lexSave's seed stats row owns batch_id 0)
      lexPath.foreach { lp =>
        graft.operators.Lexical.lexAppendSave(
          kept.sparkSession, lp, kept.select(col("doc_id"), col("text")),
          batchId + 1L)
      }
      keptSigs.write.mode("append").parquet(sigStorePath)
    }
    release()
    nKept
  }

  /** Start the unified ingest: `docs` is an unbounded stream of
    * (doc_id, text, embedding) rows; the index at `indexPath` must
    * already exist (any `ivfSave`/`pqSave`/`opqSave`/`ivfPqSave`
    * layout — batches ride its frozen quantizer). Default trigger is
    * a continuous micro-batch loop; pass `Trigger.AvailableNow()` for
    * a one-shot backfill (availability snapshots at query start, as
    * with the standalone loops). */
  def start(docs: DataFrame, sigStorePath: String, outPath: String,
            indexPath: String, telemetryPath: String, threshold: Double,
            checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime(0L),
            vocabPath: Option[String] = None,
            neighborsPath: Option[String] = None,
            neighborK: Int = 5, neighborProbe: Int = 2,
            neighborScanFrac: Option[Double] = None,
            lexPath: Option[String] = None): StreamingQuery = {
    val cols = Seq("doc_id", "text", "embedding") ++
      (if (vocabPath.isDefined) Seq("source") else Nil)
    docs.select(cols.map(col): _*).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, sigStorePath, outPath, indexPath,
          telemetryPath, threshold, vocabPath, neighborsPath,
          neighborK, neighborProbe, neighborScanFrac, lexPath)
        ()
      }
      .start()
  }

  /** `start` with a MAINTAINED index: each micro-batch runs against
    * the supervisor's current generation, then the supervisor gates a
    * rebuild (growth/skew) before the next batch — maintenance
    * serializes with appends inside the foreachBatch, which is the
    * simplest policy that needs no replay at all; a concurrent
    * offline `supervisor.maintain()` is also legal (the gap-replay
    * contract covers racing appends). This is the loop that keeps
    * per-batch mining cost flat as the store grows (SCALE.md round 8:
    * 38–43 s across an 8× store vs 43 → 87 s frozen). Pair
    * `neighborScanFrac` with it when mining must hold RECALL instead
    * of cost across the generation swaps. */
  def startSupervised(docs: DataFrame, sigStorePath: String, outPath: String,
                      supervisor: IngestVectors.IndexSupervisor,
                      telemetryPath: String, threshold: Double,
                      checkpoint: String,
                      trigger: Trigger = Trigger.ProcessingTime(0L),
                      vocabPath: Option[String] = None,
                      neighborsPath: Option[String] = None,
                      neighborK: Int = 5, neighborProbe: Int = 2,
                      neighborScanFrac: Option[Double] = None,
                      lexPath: Option[String] = None): StreamingQuery = {
    val cols = Seq("doc_id", "text", "embedding") ++
      (if (vocabPath.isDefined) Seq("source") else Nil)
    docs.select(cols.map(col): _*).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, sigStorePath, outPath,
          supervisor.currentPath, telemetryPath, threshold, vocabPath,
          neighborsPath, neighborK, neighborProbe, neighborScanFrac,
          lexPath)
        supervisor.maintain()
        ()
      }
      .start()
  }
}
