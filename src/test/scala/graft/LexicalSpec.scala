package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Lexical, TextAnalysis}
import graft.streaming.IngestLexical

/** Persisted inverted index: store-backed BM25 equals the in-memory
  * scorer, appends are incremental, replays collapse exactly, and the
  * streaming ingest equals the batch fold. */
class LexicalSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
  private val terms = Seq("spark", "merge", "dup")

  private def asSeq(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("store-backed search equals bm25TopK bit-for-bit") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("lex_eq")
    Lexical.lexSave(spark, docs, dir)
    val store = asSeq(Lexical.lexSearch(spark, dir, terms, 20))
    val direct = asSeq(TextAnalysis.bm25TopK(docs, terms, 20))
    assert(store == direct && store.nonEmpty)
  }

  test("incremental append: two batches equal the one-shot store; geometry is enforced") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("lex_inc")
    Lexical.lexSave(spark, docs.where($"doc_id" < 250), dir)
    Lexical.lexAppendSave(spark, dir, docs.where($"doc_id" >= 250), 1L)
    val inc = asSeq(Lexical.lexSearch(spark, dir, terms, 20))
    assert(inc == asSeq(TextAnalysis.bm25TopK(docs, terms, 20)))
    val e = intercept[IllegalArgumentException] {
      Lexical.lexAppendSave(spark, tmp("lex_not_a_store"), docs, 2L)
    }
    assert(e.getMessage.contains("not a lexSave store"))
  }

  test("at-least-once replay: searches unchanged before AND after compaction") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("lex_replay")
    Lexical.lexSave(spark, docs.where($"doc_id" < 400), dir)
    val batch = docs.where($"doc_id" >= 400)
    Lexical.lexAppendSave(spark, dir, batch, 1L)
    Lexical.lexAppendSave(spark, dir, batch, 1L) // the replay
    val want = asSeq(TextAnalysis.bm25TopK(docs, terms, 20))
    assert(asSeq(Lexical.lexSearch(spark, dir, terms, 20)) == want)
    val docRows = spark.read.parquet(s"$dir/docstats").count()
    assert(Lexical.lexCompact(spark, dir) > 0)
    assert(spark.read.parquet(s"$dir/docstats").count() < docRows)
    assert(spark.read.parquet(s"$dir/stats").count() == 2)
    assert(asSeq(Lexical.lexSearch(spark, dir, terms, 20)) == want)
  }

  test("rebalance: searches bit-equal across a geometry change, appends follow it") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("lex_rebal")
    Lexical.lexSave(spark, docs.where($"doc_id" < 250), dir, nBuckets = 8)
    val before = asSeq(Lexical.lexSearch(spark, dir, terms, 20))
    val beforeRows = spark.read.parquet(s"$dir/postings").count()
    Lexical.lexRebalance(spark, dir, 61) // co-prime geometry, full remap
    assert(spark.read.parquet(s"$dir/meta").head().getInt(0) == 61)
    assert(spark.read.parquet(s"$dir/postings").count() == beforeRows)
    // geometry-independent scoring: bit-equal result
    assert(asSeq(Lexical.lexSearch(spark, dir, terms, 20)) == before)
    // appends after the rebalance cut to the NEW geometry and the
    // incremental store still equals the one-shot scorer
    Lexical.lexAppendSave(spark, dir, docs.where($"doc_id" >= 250), 1L)
    assert(asSeq(Lexical.lexSearch(spark, dir, terms, 20)) ==
      asSeq(TextAnalysis.bm25TopK(docs, terms, 20)))
    // the probe-volume dial actually moved: a single term's bucket
    // holds fewer co-hashed postings under the finer geometry
    val wide = tmp("lex_rebal_wide")
    Lexical.lexSave(spark, docs, wide, nBuckets = 1)
    val coarse = Lexical.lexProbeRows(spark, wide, Seq("spark"))
    Lexical.lexRebalance(spark, wide, 61)
    val fine = Lexical.lexProbeRows(spark, wide, Seq("spark"))
    assert(coarse == spark.read.parquet(s"$wide/postings").count())
    assert(fine < coarse)
  }

  test("rebalance crash window self-heals: a rerun restores postings.old instead of deleting it") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("lex_heal")
    Lexical.lexSave(spark, docs.where($"doc_id" < 100), dir, nBuckets = 4)
    val before = asSeq(Lexical.lexSearch(spark, dir, terms, 20))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash between rename(postings -> .old) and the
    // promote: .old IS the only complete postings copy
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/postings"),
      new org.apache.hadoop.fs.Path(s"$dir/postings.old")))
    Lexical.lexRebalance(spark, dir, 7) // rerun must heal, then rebalance
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/postings.old")))
    assert(spark.read.parquet(s"$dir/meta").head().getInt(0) == 7)
    assert(asSeq(Lexical.lexSearch(spark, dir, terms, 20)) == before)
  }

  test("lexMaintain: growth-gated — no-op under target, rebalances past it") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("lex_maint")
    Lexical.lexSave(spark, docs, dir, nBuckets = 4)
    // generous target: mean bucket is under growFactor×target → no-op
    assert(Lexical.lexMaintain(spark, dir, targetRowsPerBucket = 1000000L) == 4)
    assert(spark.read.parquet(s"$dir/meta").head().getInt(0) == 4)
    val before = asSeq(Lexical.lexSearch(spark, dir, terms, 20))
    // tiny target: must rebalance to ceil(rows/target) and stay bit-equal
    val rows = spark.read.parquet(s"$dir/postings").count()
    val got = Lexical.lexMaintain(spark, dir, targetRowsPerBucket = 10L)
    assert(got == ((rows + 9L) / 10L).toInt)
    assert(spark.read.parquet(s"$dir/meta").head().getInt(0) == got)
    assert(asSeq(Lexical.lexSearch(spark, dir, terms, 20)) == before)
  }

  test("lexMaintain interleaved with appends: geometry grows, searches stay exact") {
    // the streaming-adjacent discipline: append batches, run the
    // growth gate between them (never concurrently), and the final
    // store must still reproduce the one-shot scorer bit-for-bit
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("lex_maintfold")
    Lexical.lexSave(spark, docs.where($"doc_id" < 100), dir, nBuckets = 1)
    val cuts = Seq(100L, 200L, 300L, 400L, Long.MaxValue)
    var geoms = List(1)
    cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      Lexical.lexAppendSave(spark, dir,
        docs.where($"doc_id" >= lo && $"doc_id" < hi), i + 1L)
      geoms ::= Lexical.lexMaintain(spark, dir,
        targetRowsPerBucket = 500L, growFactor = 2)
    }
    assert(geoms.max > 1, s"geometry never grew: $geoms")
    assert(asSeq(Lexical.lexSearch(spark, dir, terms, 20)) ==
      asSeq(TextAnalysis.bm25TopK(docs, terms, 20)))
  }

  test("rrfFusionStores equals the in-memory rrfFusion rank-for-rank") {
    import graft.operators.Similarity
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vdir = tmp("lex_fus_vec"); val ldir = tmp("lex_fus_lex")
    val idx = Similarity.ivfBuild(emb.where($"vec_id" >= 5), 8)
    Similarity.ivfSave(idx, vdir)
    idx.release()
    Lexical.lexSave(spark, docs.where($"doc_id" >= 5), ldir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val store = rows(Similarity.rrfFusionStores(
      spark, vdir, ldir, emb.where($"vec_id" < 5), terms, 10))
    val direct = rows(Similarity.rrfFusion(emb, docs, terms, 5, 10))
    assert(store == direct && store.nonEmpty)
  }

  test("streaming ingest equals the batch fold") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("lex_stream")
    Lexical.lexSave(spark, docs.where($"doc_id" < 200), dir)
    val b1 = docs.where($"doc_id" >= 200 && $"doc_id" < 350)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val b2 = docs.where($"doc_id" >= 350)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = IngestLexical.start(
      input.toDF().toDF("doc_id", "text"), dir, tmp("lex_ckpt"))
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    assert(asSeq(Lexical.lexSearch(spark, dir, terms, 20)) ==
      asSeq(TextAnalysis.bm25TopK(docs, terms, 20)))
  }
}
