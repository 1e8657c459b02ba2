package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.IngestVocab

/** Streaming vocabulary cardinality via mergeable HLL sketches: union
  * of batch sketches equals one sketch of everything (lossless merge),
  * the estimate tracks the exact distinct count within the sketch's
  * error bound, and replays perturb nothing (idempotent union). */
class IngestVocabSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("union of batch sketches == one-shot sketch; estimate within bound of exact") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "text")
    val store = tmp("vocab_store")
    val cuts = Seq((0L, 150L), (150L, 300L), (300L, Long.MaxValue))
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      IngestVocab.processBatch(
        all.where($"doc_id" >= lo && $"doc_id" < hi), i.toLong, store)
    }
    val rep = IngestVocab.report(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.length == 20 && rep.forall(_._2 == 3))  // 20 sources × 3 batches

    // merged estimate == the one-shot sketch of the whole corpus
    val oneShot = all
      .select(col("source"), explode(split(lower(trim(col("text"))), " ")).as("w"))
      .groupBy("source")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(w, 12))").as("est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    rep.foreach { case (src, _, _, est) =>
      assert(est == oneShot(src), s"$src: merged $est != one-shot ${oneShot(src)}")
    }

    // and within the sketch's error envelope of the exact count
    val exact = graft.operators.TextAnalysis.vocabCardinality(all).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    rep.foreach { case (src, _, _, est) =>
      val err = math.abs(est - exact(src)).toDouble / exact(src)
      assert(err <= 0.05, s"$src: est $est vs exact ${exact(src)}, err $err")
    }

    // replay idempotence: re-appending batch 1's rows changes no estimate
    val before = rep.map(r => r._1 -> r._4).toMap
    IngestVocab.processBatch(
      all.where($"doc_id" >= 150L && $"doc_id" < 300L), 1L, store)
    val after = IngestVocab.report(spark, store).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(after == before)
  }

  test("streaming start appends sketch rows batch by batch") {
    val (store, ckpt) = (tmp("vocab_s_store"), tmp("vocab_s_ckpt"))
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = IngestVocab.start(
      input.toDF().toDF("source", "text"), store, ckpt)
    input.addData(("s1", "alpha beta gamma"), ("s2", "one two"))
    q.processAllAvailable()
    input.addData(("s1", "beta delta"), ("s2", "two three four"))
    q.processAllAvailable()
    q.stop()
    val rep = IngestVocab.report(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // tiny vocabularies: HLL is exact at this cardinality
    assert(rep == Seq(("s1", 2L, 5L, 4L), ("s2", 2L, 5L, 4L)))
  }

  test("replay rows collapse by (source, batch_id) KEY, not by sketch bytes") {
    // a replayed batch's sketch row is NOT guaranteed bit-identical:
    // HLL sparse-mode serialization depends on aggregation order.
    // Simulate the worst case — same key, different bytes — and pin
    // that n_tokens/n_batches still count the batch once.
    def sk(words: Seq[String]) = words.toDF("w")
      .agg(expr("hll_sketch_agg(w, 12)").as("s"))
      .collect().head.getAs[Array[Byte]](0)
    // the two rows for batch 0 carry guaranteed-different bytes (the
    // worst-case stand-in for order-divergent serialization of the
    // same batch); both token sets union with batch 1 to 4 distinct,
    // so every assert below is survivor-independent
    val a = sk(Seq("alpha", "beta", "gamma"))
    val b = sk(Seq("alpha", "beta", "zeta"))
    assert(!java.util.Arrays.equals(a, b),
      "test setup: replay sketches should differ at the byte level")
    val rows = Seq((0L, "s1", a, 3L), (0L, "s1", b, 3L), (1L, "s1", sk(Seq("delta")), 1L))
      .toDF("batch_id", "source", "sketch", "n_tokens")
    val rep = IngestVocab.mergeReport(rows).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // byte-level distinct would keep both replay rows -> n_tokens 7
    assert(rep.toSeq == Seq(("s1", 2L, 4L, 4L)), rep.mkString(","))
  }
}
