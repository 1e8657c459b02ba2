package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.TrainingData

/** Batch/stream parity for the stateless curation pass: the same
  * `curateStream` call must admit the same documents with the same
  * split/redaction under `readStream` as in batch — the property that
  * lets a streaming ingestion path and a batch backfill share one
  * curation policy without drift. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (0L, "plain text without contacts", "en", "keepall", 27L),
    (1L, "mail me at a.user@example.org today", "en", "keepall", 35L),
    (2L, "call +1-555-0100 or write b@ex.net", "en", "half", 34L),
    (3L, "another plain document here", "pt", "half", 27L),
    (4L, "dropped source regardless of content", "en", "none", 36L),
    (5L, "one more to spread the hash keys", "en", "half", 32L))

  private val weights = Map("half" -> 0.5, "none" -> 0.0)

  test("curateStream: identical admissions and projections, batch vs stream") {
    val batch = TrainingData.curateStream(
      rows.toDF("doc_id", "text", "lang", "source", "n_chars"), weights)
      .collect().map(_.toSeq).toSet
    assert(batch.nonEmpty, "batch pass must admit at least one doc")
    assert(!batch.exists(_(1) == "none"), "weight 0.0 source must drop")
    assert(batch.exists(_(3).toString.contains("<EMAIL>")), "redaction must fire")

    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, String, Long)]
    val q = TrainingData.curateStream(
      input.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"), weights)
      .writeStream.format("memory").queryName("cur").outputMode("append").start()
    // two micro-batches: admission must not depend on batch boundaries
    input.addData(rows.take(3): _*)
    q.processAllAvailable()
    input.addData(rows.drop(3): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cur").collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
