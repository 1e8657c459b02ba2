package graft

import java.io.{File, FileOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Discovery
import graft.profile._

/** §3.1 sync lifecycle end-to-end: discovery work-list → per-resource
  * profiling (with cache reuse on the second run) → manifest envelope →
  * incremental merge → dual publish. */
class SyncPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("sync run 1 profiles, run 2 reuses cache and merges incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("sync").toFile
    def put(name: String, content: String): String = {
      val f = new File(dir, name)
      val o = new FileOutputStream(f); o.write(content.getBytes("UTF-8")); o.close()
      f.getAbsolutePath
    }
    val p1 = put("focos_202401.csv", "a;b\n1;2\n3;4\n")
    val p2 = put("focos_202402.csv", "a;b\n5;6\n")
    put("focos_202312.csv", "a;b\n9;9\n") // older — outside latest-2

    // 1. discovery: listing → latest-2 work list
    val listing = Seq(
      (p1, "focos_202401.csv"), (p2, "focos_202402.csv"),
      (new File(dir, "focos_202312.csv").getAbsolutePath, "focos_202312.csv"))
      .toDF("url", "filename")
    val workList = Discovery.selectLatest(listing, 2).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(workList.map(_._2).toSeq == Seq("focos_202402.csv", "focos_202401.csv"))

    // 2. profile each resource, build manifest run 1
    val items1 = workList.map { case (url, _) =>
      Manifest.itemFromProfile(Profiler.profilePath(url), s"file://$url")
    }.toSeq
    val env1 = Manifest.build("focos", "Focos", "https://src", "pfx",
      items1, items1.map(_ => "ok"), Seq("source_agency" -> JStr("INPE")),
      generatedAt = "2026-08-12T00:00:00Z")
    assert(env1.generationStatus == "success")

    // 3. publish + reload cache from the manifest
    val out = new File(dir, "out").getAbsolutePath
    Sink.dualPublish(out, "manifest.json", "2026-08-12", Manifest.toJson(env1))
    assert(new File(s"$out/manifest.json").exists())
    assert(new File(s"$out/snapshots/2026/08/12/manifest.json").exists())

    val cache = ProfileCache.fromManifest(env1.items)
    assert(cache.size == 2) // both real profiles cached

    // 4. run 2: one new resource; cached URLs skip re-profiling
    val p3 = put("focos_202403.csv", "a;b\n7;8\n")
    val run2Urls = Seq(s"file://$p2", s"file://$p3")
    var profiled = Vector.empty[String]
    val items2 = run2Urls.map { url =>
      cache.get(url) match {
        case Some(fields) => ManifestItem(url, fields.toSeq)
        case None =>
          profiled :+= url
          Manifest.itemFromProfile(Profiler.profilePath(url.stripPrefix("file://")), url)
      }
    }
    assert(profiled == Vector(s"file://$p3")) // only the new one

    // 5. incremental merge keeps run-1-only items
    val merged = Manifest.incrementalMerge(env1.items, items2)
    assert(merged.map(_.sourceUrl).toSet ==
      Set(s"file://$p1", s"file://$p2", s"file://$p3"))
  }

  test("withRetries: retries then succeeds; exhausts then throws") {
    var n = 0
    val v = Sink.withRetries(3, 1) { () =>
      n += 1; if (n < 3) sys.error("flaky") else 42
    }
    assert(v == 42 && n == 3)
    intercept[RuntimeException] {
      Sink.withRetries(2, 1) { () => sys.error("always") }
    }
  }
}
