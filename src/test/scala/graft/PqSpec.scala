package graft

import graft.operators.Similarity

/** Product quantization (Similarity.pqTopK / pqTopKRefine): recall of
  * the ADC search vs the float brute-force baseline on real testdata
  * embeddings, the refine stage's repair of quantization rank error,
  * and determinism of the whole codebook-fit → encode → search path. */
class PqSpec extends SparkSpec {

  private val testEmb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet

  test("pqTopK recall@10 vs float cosineTopK on testdata") {
    val gold = pairs(Similarity.cosineTopK(testEmb, 20, 10))
    val pq = pairs(Similarity.pqTopK(testEmb, 20, 10))
    val recall = (gold & pq).size.toDouble / gold.size
    info(s"pq (m=8, kSub=16) recall@10 = $recall")
    assert(recall >= 0.6, s"recall $recall") // 64x compression: honest floor
  }

  test("pqTopKRefine repairs ADC rank error to >= 0.9 recall") {
    val gold = pairs(Similarity.cosineTopK(testEmb, 20, 10))
    val re = pairs(Similarity.pqTopKRefine(testEmb, 20, 10))
    val recall = (gold & re).size.toDouble / gold.size
    info(s"pq+refine recall@10 = $recall")
    assert(recall >= 0.9, s"recall $recall")
  }

  test("pqTopK is deterministic across runs") {
    val a = Similarity.pqTopK(testEmb, 10, 5).collect().toSeq
    val b = Similarity.pqTopK(testEmb, 10, 5).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size == 50)
  }
}
