package graft

import graft.operators.Dedup

/** Recall proofs for the banded-LSH dedup family (VERDICT round 1
  * "What's wrong" #2/#3): the rows-only q36/q65 entries have no oracle,
  * so these specs pin their recall against exact pair sets computed on
  * the driver testdata.
  */
class DedupRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  test("minhashPairs recall >= 0.9 against exact jaccard-0.5 pairs, no false positives") {
    val exact = Dedup.ngramJaccardPairs(docs, Long.MaxValue, 0.5)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata must contain near-dup pairs")
    val got = Dedup.minhashPairs(docs, 0.5)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (${got.size} found, ${exact.size} exact)")
    // candidates are verified with exact jaccard, so precision is 1.0
    assert(got.subsetOf(exact), s"false positives: ${got.diff(exact)}")
  }

  test("simhashPairs recall is exactly 1.0 for hamming <= maxHamming (pigeonhole)") {
    val maxHamming = 6
    val sims = Dedup.simhash(docs, Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exact all-pairs hamming on the driver (500 docs -> 125k pairs: fine here,
    // never in the engine)
    val exact = (for {
      i <- sims.indices; j <- (i + 1) until sims.length
      if java.lang.Long.bitCount(sims(i)._2 ^ sims(j)._2) <= maxHamming
    } yield {
      val (a, b) = (sims(i)._1, sims(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    assert(exact.nonEmpty, "testdata must contain simhash near-dups")
    val got = Dedup.simhashPairs(docs, Long.MaxValue, maxHamming)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact,
      s"missed: ${exact.diff(got).take(5)}; spurious: ${got.diff(exact).take(5)}")
    // both key widths are recall-1.0 by the same pigeonhole argument
    val gotB4 = Dedup.simhashPairs(docs, Long.MaxValue, maxHamming, blockChoose = 4)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotB4 == exact)
  }

  test("banding candidate volume stays within a small multiple of verified pairs") {
    // The LSH-efficiency contract the scaladoc claims and ScaleReport
    // measures at sf1/sf10: candidates must track the true-pair count,
    // not the corpus squared. Bounds chosen ~3x above the measured
    // values on this corpus so genuine regressions (e.g. correlated
    // fingerprints, broken band keys) fail loudly.
    val mhCand = Dedup.minhashCandidatePairs(docs).count()
    val mhVerified = Dedup.minhashPairs(docs, 0.5).count()
    assert(mhVerified > 0)
    assert(mhCand <= math.max(50L, 10L * mhVerified),
      s"minhash candidates $mhCand vs verified $mhVerified")
    val shCand = Dedup.simhashCandidatePairs(docs, Long.MaxValue, 6).count()
    val shVerified = Dedup.simhashPairs(docs, Long.MaxValue, 6).count()
    assert(shVerified > 0)
    assert(shCand <= math.max(100L, 30L * shVerified),
      s"simhash candidates $shCand vs verified $shVerified")
  }
}
