package graft

import graft.operators.{MediaMeta, MediaRow, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, String, String, Long)*) =
    rows.map { case (id, kind, payload, dur) =>
      MediaRow(id, kind, payload.getBytes("UTF-8"), MediaMeta(640, 480, dur, "fake"))
    }.toDS()

  test("extractFeatures: deterministic stub features, batch plumbing intact") {
    val ds = media((1L, "image", "abc", 0L), (2L, "audio", "abc", 0L))
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out(0).features.toSeq == out(1).features.toSeq) // same payload → same features
    assert(out(0).n_bytes == 3)
    assert(out(0).features.length == 8)
  }

  test("sampleFrames: only video rows, deterministic offsets") {
    val ds = media((1L, "video", "x", 5000L), (2L, "image", "x", 5000L))
    val out = Multimodal.sampleFrames(ds, 1000L).collect()
    assert(out.forall(_.media_id == 1L))
    assert(out.map(_.offset_ms).toSeq == Seq(0L, 1000L, 2000L, 3000L, 4000L))
  }

  test("fromDocuments: schema has binary payload + typed metadata") {
    val docs = Seq((1L, "hello", "en", "src0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ds = Multimodal.fromDocuments(docs)
    val r = ds.collect().head
    assert(new String(r.content, "UTF-8") == "hello")
    assert(r.meta.codec == "fake")
    val resized = Multimodal.resizeMeta(ds.toDF(), 32, 32)
      .selectExpr("meta.width", "meta.height").collect().head
    assert(resized.getInt(0) == 32 && resized.getInt(1) == 32)
  }

  test("repartitionByBytes: partition count honored") {
    val ds = media((1L to 20L).map(i => (i, "image", "p" * i.toInt, 0L)): _*)
    assert(Multimodal.repartitionByBytes(ds, 4).rdd.getNumPartitions == 4)
  }
}
