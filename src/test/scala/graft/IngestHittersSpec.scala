package graft

import org.apache.spark.sql.functions.col
import graft.operators.Dedup
import graft.streaming.IngestHitters

/** Streaming heavy-hitter tracking: the CMS store after N batches
  * equals the sketch of everything ever ingested bit-for-bit (counter
  * addition is exact), so incremental maintenance loses nothing vs a
  * full recompute. */
class IngestHittersSpec extends SparkSpec {

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  private def sketchMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("cmsMerge equals the sketch of the concatenated corpora, bit-for-bit") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = all.where(col("doc_id") < 250)
    val b = all.where(col("doc_id") >= 250)
    val merged = Dedup.cmsMerge(Dedup.cmsSketch(a), Dedup.cmsSketch(b))
    assert(sketchMap(merged) == sketchMap(Dedup.cmsSketch(all)))
  }

  test("store lifecycle: save, merge batches, load equals full-corpus sketch") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("cms_store")
    Dedup.cmsStoreSave(Dedup.cmsSketch(all.where(col("doc_id") < 150)), dir)
    Dedup.cmsStoreMerge(spark, dir,
      all.where(col("doc_id") >= 150 && col("doc_id") < 300))
    Dedup.cmsStoreMerge(spark, dir, all.where(col("doc_id") >= 300))
    assert(sketchMap(Dedup.cmsStoreLoad(spark, dir)) ==
      sketchMap(Dedup.cmsSketch(all)))
    // only the newest generation survives the prune
    val gens = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.matches("g\\d+")).sorted.toSeq
    assert(gens == Seq("g2"))
  }

  test("processBatch initializes then folds; store top-k equals one-shot") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = tmp("cms_ingest")          // pre-created empty dir: no store yet
    assert(!Dedup.cmsStoreExists(spark, dir))
    assert(IngestHitters.processBatch(all.where(col("doc_id") < 200), dir) > 0)
    assert(IngestHitters.processBatch(
      all.where(col("doc_id") >= 200 && col("doc_id") < 201)
        .where(col("doc_id") < 0), dir) == 0)   // empty batch: no-op
    assert(IngestHitters.processBatch(all.where(col("doc_id") >= 200), dir) > 0)
    val inc = Dedup.cmsStoreTopK(spark, dir, all, sampleMod = 8).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val one = Dedup.cmsHeavyHitters(all, 5, 25).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(inc.toSeq == one.toSeq)
  }

  test("store geometry is enforced: mismatched merge and double-save are rejected") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val docs = all.where(col("doc_id") < 50)
    val dir = tmp("cms_geom")
    Dedup.cmsStoreSave(Dedup.cmsSketch(docs, 5, 4, 8192), dir, 5, 4, 8192)
    assert(Dedup.cmsStoreGeometry(spark, dir) == ((5, 4, 8192)))
    // merging a sketch of different geometry would be pure collision noise
    intercept[IllegalArgumentException] {
      Dedup.cmsStoreMerge(spark, dir, docs, k = 5, depth = 4, width = 4096)
    }
    intercept[IllegalArgumentException] {
      Dedup.cmsStoreMerge(spark, dir, docs, k = 3, depth = 4, width = 8192)
    }
    // a second save would silently discard the newest generation
    intercept[IllegalArgumentException] {
      Dedup.cmsStoreSave(Dedup.cmsSketch(docs), dir)
    }
    // matching geometry still folds fine after the rejections
    Dedup.cmsStoreMerge(spark, dir, all.where(col("doc_id") >= 50))
    assert(sketchMap(Dedup.cmsStoreLoad(spark, dir)) ==
      sketchMap(Dedup.cmsSketch(all)))
  }

  test("pre-geometry store (generations but no meta/) fails with the recovery path") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val docs = all.where(col("doc_id") < 50)
    val dir = tmp("cms_pregeom")
    // a store written before geometry metadata existed: g0, no meta/
    Dedup.cmsSketch(docs).write.parquet(s"$dir/g0")
    val ex = intercept[IllegalArgumentException] {
      Dedup.cmsStoreMerge(spark, dir, docs)
    }
    // actionable message, not the parquet reader's path-not-found
    assert(ex.getMessage.contains("pre-geometry") &&
      ex.getMessage.contains("cmsStoreSave"), ex.getMessage)
    // reads that never needed the geometry still work
    assert(Dedup.cmsStoreLoad(spark, dir).count() > 0)
  }
}
