package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
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

  /** Run one micro-batch: assign against the saved centroids at
    * `indexPath` and append to its lists. Returns the batch row count.
    * Factored out of the foreachBatch closure so batch specs can drive
    * it without a streaming query. */
  def processBatch(batch: DataFrame, indexPath: String): Long = {
    val spark = batch.sparkSession
    val n = batch.count()
    if (n > 0) Similarity.ivfAppendSave(spark, indexPath, batch)
    n
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
