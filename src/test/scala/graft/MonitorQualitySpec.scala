package graft

import org.apache.spark.sql.functions.col
import graft.operators.TrainingData
import graft.streaming.MonitorQuality

/** Streaming quality telemetry: exact per-batch rows, replay-safe
  * report, deltas match hand subtraction. */
class MonitorQualitySpec extends SparkSpec {

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("batchStats equals the batch-computed Gopher counts exactly") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 100)
    val r = MonitorQuality.batchStats(d, 7L).collect()(0)
    val g = TrainingData.gopherQuality(d, minWords = 30)
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(col("keep").cast("long"))).collect()(0)
    assert(r.getLong(0) == 7L)
    assert(r.getLong(1) == g.getLong(0))                 // n_docs
    assert(r.getLong(5) == g.getLong(1))                 // n_keep
    assert(r.getLong(6) == g.getLong(1) * 1000000L / g.getLong(0))
  }

  test("store accumulates batches; report deltas and replay-dedup hold") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("monq")
    val store = s"$dir/store"
    assert(MonitorQuality.processBatch(all.where(col("doc_id") < 200), 0L, store) > 0)
    assert(MonitorQuality.processBatch(all.where(col("doc_id") >= 200), 1L, store) > 0)
    // replay of batch 1 appends an identical row; report collapses it
    assert(MonitorQuality.processBatch(all.where(col("doc_id") >= 200), 1L, store) > 0)
    val rep = MonitorQuality.report(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7))))
    assert(rep.map(_._1).toSeq == Seq(0L, 1L))
    assert(rep(0)._4.isEmpty)                            // first batch: no delta
    assert(rep(1)._4.contains(rep(1)._3 - rep(0)._3))    // exact hand subtraction
    // batch rows match direct computation on the same slices
    val b0 = MonitorQuality.batchStats(all.where(col("doc_id") < 200), 0L)
      .collect()(0).getLong(6)
    assert(rep(0)._3 == b0)
  }
}
