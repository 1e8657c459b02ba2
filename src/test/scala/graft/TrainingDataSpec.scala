package graft

import graft.operators.TrainingData

class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("hashSplit: deterministic, covers all docs, ~80/10/10") {
    val d = docs((0L until 1000L).map(i => (i, s"doc $i")): _*)
    val out = TrainingData.hashSplit(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 1000)
    assert(out.values.toSet == Set("train", "val", "test"))
    val train = out.values.count(_ == "train")
    assert(train > 700 && train < 900, s"train share off: $train/1000")
    // content-free: same ids → same assignment on re-run
    val again = TrainingData.hashSplit(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == out)
  }

  test("quotaSample: at most n per stratum, deterministic subset") {
    val d = (0L until 300L).map(i =>
      (i, s"t$i", if (i % 3 == 0) "en" else "pt", "src0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TrainingData.quotaSample(d, "lang", 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.length == 20)
    assert(out.count(_._1 == "en") == 10 && out.count(_._1 == "pt") == 10)
    val again = TrainingData.quotaSample(d, "lang", 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(again.toSeq == out.toSeq)
  }

  test("repetitionFilter: duplicate-bigram fractions match hand count") {
    // "a b a b a b": bigrams (a b)×3, (b a)×2 → n=5, distinct=2,
    // dup_frac=3/5, top_frac=3/5. "v w x y z": 4 unique bigrams.
    val d = docs(1L -> "a b a b a b", 2L -> "v w x y z")
    val out = TrainingData.repetitionFilter(d, 0.2).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((5L, 0.6, 0.6, false)))
    assert(out(2L) == ((4L, 0.0, 0.25, true)))
  }

  test("piiRedact: emails and phones tagged and counted") {
    val d = docs(
      1L -> "write to a.user+x@mail.example.org or +55-555-1234 today",
      2L -> "no contact details here")
    val out = TrainingData.piiRedact(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L) == (("write to <EMAIL> or <PHONE> today", 1, 1)))
    assert(out(2L) == (("no contact details here", 0, 0)))
  }

  test("tokenPack: shards follow the global running token sum") {
    // token counts: 3, 3, 3, 3 → prefix-before 0,3,6,9; budget 6 →
    // shards 0,0,1,1. bucketRows=2 forces the two-level path (2 buckets).
    val d = docs(
      0L -> "a b c", 1L -> "d e f", 2L -> "g h i", 3L -> "j k l")
    val out = TrainingData.tokenPack(d, 6L, 2L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 3, 0L), (1L, 3, 0L), (2L, 3, 1L), (3L, 3, 1L)))
  }

  test("decontaminate: counts distinct shared 3-gram shingles") {
    val eval = docs(1L -> "the quick brown fox jumps")
    val corpus = docs(
      10L -> "see the quick brown fox run",   // shares 2 shingles
      11L -> "the quick brown fox jumps too", // shares 3
      12L -> "nothing in common at all")
    val out = TrainingData.decontaminate(corpus, eval, 3, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((10L, 2L), (11L, 3L)))
  }
}
