package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.profile._
import graft.operators.Windows
import org.apache.spark.sql.functions.{col, lit}

class ProfileCacheSpec extends AnyFunSuite {
  private def item(url: String, fields: (String, JVal)*) =
    ManifestItem(url, fields)

  test("fromManifest: real profiles cached, sentinels rejected") {
    val cache = ProfileCache.fromManifest(Seq(
      item("https://x/a.csv", "sha256" -> JStr("abc123"),
        "size_bytes" -> JNum(10), "profile_status" -> JStr("ok"),
        "profiled_at" -> JStr("2026-01-01T00:00:00Z")),
      item("https://x/external.csv", "sha256" -> JStr("EXTERNAL"),
        "size_bytes" -> JNum(5)),                                   // sentinel: external sha
      item("https://x/empty.csv", "size_bytes" -> JNum(0)),         // sentinel: zero+no sha
      item("https://x/skip.csv", "profile_status" -> JStr("skipped")), // sentinel: skipped, no profiled_at
      item("https://x/none.csv", "title" -> JStr("not a cache field"))))
    assert(cache.keySet == Set("https://x/a.csv"))
    assert(cache("https://x/a.csv").contains("sha256"))
  }

  test("fromManifest: skipped WITH profiled_at is a real (negative) profile") {
    val cache = ProfileCache.fromManifest(Seq(
      item("https://x/s.xlsx", "profile_status" -> JStr("skipped"),
        "profiled_at" -> JStr("2026-01-01T00:00:00Z"), "size_bytes" -> JNum(9))))
    assert(cache.contains("https://x/s.xlsx"))
  }
}

class ReferenceCadenceSpec extends SparkSpec {
  import spark.implicits._

  test("reference cadence ladder and confidence match classifier semantics") {
    // (obs, changes, medianDays, cv, nWarnings, nMethods, wantCadence, wantConf)
    val cases = Seq(
      (10L, 1L, Some(1.0), Some(0.1), 0L, 1L, "ad_hoc", "low"),          // many obs, <2 changes
      (4L, 2L, Some(1.0), Some(0.1), 0L, 1L, "insufficient_data", "low"),
      (31L, 10L, Some(1.0), Some(0.9), 0L, 1L, "irregular", "low"),      // cv too high
      (31L, 10L, Some(1.0), Some(0.2), 0L, 1L, "daily", "high"),
      (9L, 5L, Some(7.0), Some(0.3), 0L, 1L, "weekly", "medium"),
      (7L, 4L, Some(30.0), Some(0.3), 0L, 1L, "monthly", "medium"),
      (7L, 4L, Some(15.0), Some(0.3), 0L, 1L, "irregular", "medium"),
      (31L, 10L, Some(1.0), Some(0.2), 1L, 1L, "daily", "low"),          // warning → low
      (31L, 10L, Some(1.0), Some(0.2), 0L, 2L, "daily", "low"))          // mixed methods → low
    val df = cases.map { case (o, c, m, v, w, me, _, _) =>
      (o, c, m.getOrElse(-1.0), v.getOrElse(-1.0), w, me)
    }.toDF("obs", "changes", "median_days", "cv", "n_warn", "n_methods")
    val out = df.select(
      Windows.referenceCadence(col("obs"), col("changes"),
        col("median_days"), col("cv")).as("cad"),
      Windows.referenceConfidence(col("obs"), col("changes"), col("cv"),
        col("n_warn"), col("n_methods")).as("conf"))
      .collect()
    cases.zip(out).foreach { case ((_, _, _, _, _, _, wc, wf), r) =>
      assert(r.getString(0) == wc, s"cadence for $r")
      assert(r.getString(1) == wf, s"confidence for $r")
    }
    val _ = lit(1)
  }
}
