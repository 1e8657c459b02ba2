package graft

import graft.operators.{Audit, Discovery}

class DiscoveryAuditSpec extends SparkSpec {
  import spark.implicits._

  test("selectLatest: period-desc top-n with deterministic tiebreak") {
    val listing = Seq(
      ("u1", "focos_202401.zip"), ("u2", "focos_202403.zip"),
      ("u3", "focos_202402.zip"), ("u4", "readme.md"))
      .toDF("url", "filename")
    val out = Discovery.selectLatest(listing, 2).collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(out.toSeq == Seq(("u2", "2024-03"), ("u3", "2024-02")))
  }

  test("yearFilter: yyyymm // 100 == year") {
    val listing = Seq(("a", "m_202401.csv"), ("b", "m_202312.csv")).toDF("url", "filename")
    assert(Discovery.yearFilter(listing, 2024).collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("urlPolicy: https + host allowlist + suffix + exclude regex") {
    val listing = Seq(
      "https://dados.gov.br/x/a.csv",      // ok
      "http://dados.gov.br/x/b.csv",       // not https
      "https://evil.example.com/x/c.csv",  // host not allowed
      "https://dados.gov.br/x/d.pdf",      // suffix not allowed
      "https://dados.gov.br/x/tmp_e.csv")  // excluded pattern
      .toDF("url")
    val out = Discovery.policyFilter(listing,
      Seq("dados.gov.br", "inpe.br"), Seq(".csv", ".zip"), "tmp_")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("https://dados.gov.br/x/a.csv"))
  }

  test("audit from profiler output end-to-end") {
    import java.io.{File, FileOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("audits").toFile
    def put(name: String, content: String): String = {
      val f = new File(dir, name)
      val o = new FileOutputStream(f); o.write(content.getBytes); o.close()
      f.getAbsolutePath
    }
    val profiles = Seq(
      graft.profile.Profiler.profilePath(put("f1.csv", "a;b;c\n1;2;3\n")),
      graft.profile.Profiler.profilePath(put("f2.csv", "a;b;c\n4;5;6\n")),
      graft.profile.Profiler.profilePath(put("f3.csv", "a;b;d\n7;8;9\n")))
    val frame = Audit.fromProfiles(spark, profiles)
    val modal = Audit.modalSchema(frame).collect().head
    assert(modal.getSeq[String](0) == Seq("a", "b", "c"))
    assert(Audit.divergentFiles(frame).collect().map(_.getString(0)).toSeq
      .exists(_.endsWith("f3.csv")))
  }

  test("audit: presence, modal schema, divergents") {
    val files = Seq(
      ("f1", Seq("a", "b", "c")), ("f2", Seq("a", "b", "c")),
      ("f3", Seq("a", "b", "d")))
      .toDF("file", "cols")
    val presence = Audit.schemaPresence(files).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(presence("a") == ((3L, true)))
    assert(presence("c") == ((2L, false)))
    val modal = Audit.modalSchema(files).collect().head
    assert(modal.getSeq[String](0) == Seq("a", "b", "c") && modal.getLong(1) == 2L)
    val div = Audit.divergentFiles(files).collect()
    assert(div.length == 1 && div.head.getString(0) == "f3")
    assert(div.head.getSeq[String](1) == Seq("d") && div.head.getSeq[String](2) == Seq("c"))
  }
}
