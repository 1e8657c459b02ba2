package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Edit-distance similarity join: the q-gram prefix blocking must have
  * EXACT recall (every pair within maxDist survives the filter), so
  * the result always equals brute-force pairwise levenshtein. */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(strs: org.apache.spark.sql.DataFrame, d: Int) =
    strs.select(col("id").as("id_a"), col("s").as("s_a"))
      .crossJoin(strs.select(col("id").as("id_b"), col("s").as("s_b")))
      .where(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .where(col("dist") <= d)
      .select("id_a", "id_b", "dist")
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  private def fuzzy(strs: org.apache.spark.sql.DataFrame, d: Int, q: Int = 3) =
    Dedup.editDistancePairs(strs, d, q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  private def seg(strs: org.apache.spark.sql.DataFrame, d: Int, minSeg: Int = 3) =
    Dedup.editDistancePairsSeg(strs, d, minSeg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  test("planted typos: equals brute-force pairwise levenshtein") {
    val strs = Seq(
      1L -> "deduplication pipeline", 2L -> "deduplicaton pipeline", // 1 del
      3L -> "dedupliKation pipelines",                               // sub+ins
      4L -> "a completely different string",
      5L -> "spark native analytics engine",
      6L -> "spark native analytic engine",                          // 1 del
      7L -> "spark nativ analytycs engine",                          // del+sub
      8L -> "deduplication pipeline"                                 // exact dup
    ).toDF("id", "s")
    for (d <- Seq(0, 1, 2, 4)) {
      val b = brute(strs, d)
      assert(fuzzy(strs, d) == b, s"prefix mismatch at maxDist=$d")
      assert(seg(strs, d) == b, s"seg mismatch at maxDist=$d")
    }
  }

  test("short strings (below the gram bound) pair through the length band") {
    // len < q·(d+1) = 3·3 = 9 for d=2: the gram filter is vacuous and
    // even zero-gram-overlap pairs must be found
    val strs = Seq(1L -> "abc", 2L -> "xyz", 3L -> "abd", 4L -> "ab",
      5L -> "", 6L -> "a", 7L -> "abcdabcd", 8L -> "xyzxy").toDF("id", "s")
    for (d <- Seq(0, 1, 2, 3)) {
      val b = brute(strs, d)
      assert(fuzzy(strs, d) == b, s"prefix mismatch at maxDist=$d")
      assert(seg(strs, d) == b, s"seg mismatch at maxDist=$d")
    }
  }

  test("mixed long/short and duplicate-gram strings stay exact") {
    val strs = Seq(
      1L -> "aaaaaaaaaaaaaaaaaaaa",      // duplicate grams (multiset case)
      2L -> "aaaaaaaaaaaaaaaaaab",
      3L -> "aaaa",                      // short vs long: Δlen alone prunes
      4L -> "bbbbbbbbbbbbbbbbbbbb",
      5L -> "aaaaaaaaabaaaaaaaaaa"
    ).toDF("id", "s")
    for (d <- Seq(1, 2, 3)) {
      val b = brute(strs, d)
      assert(fuzzy(strs, d) == b, s"prefix mismatch at maxDist=$d")
      assert(seg(strs, d) == b, s"seg mismatch at maxDist=$d")
    }
  }

  test("document heads at sf0.001: blocked join equals brute force; nulls drop") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id AS id", "substring(text, 1, 32) AS s")
    val b = brute(docs, 4)
    assert(fuzzy(docs, 4) == b)
    assert(seg(docs, 4) == b)
    val withNull = docs.unionByName(Seq((99999L, null: String)).toDF("id", "s"))
    assert(fuzzy(withNull, 4) == brute(withNull.where($"s".isNotNull), 4))
    assert(seg(withNull, 4) == brute(withNull.where($"s".isNotNull), 4))
  }
}
