package graft

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.reports.FocosReport

class FocosReportSpec extends SparkSpec {

  private def mkzip(dir: File, name: String, rows: Seq[String]): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(new File(dir, name)))
    z.putNextEntry(new ZipEntry(name.replace(".zip", ".csv")))
    z.write(("id;data_pas;estado;bioma\n" + rows.mkString("\n") + "\n").getBytes("UTF-8"))
    z.closeEntry(); z.close()
  }

  test("incremental report build: cache reuse + correct consolidation") {
    val zipDir = java.nio.file.Files.createTempDirectory("rzips").toFile
    val cacheDir = java.nio.file.Files.createTempDirectory("rcache").toFile.getAbsolutePath
    mkzip(zipDir, "focos_2023.zip", Seq(
      "1;2023-05-01 00:00:00;PA;AMAZONIA",
      "2;2023-05-02 00:00:00;PA;AMAZONIA",
      "3;2023-06-01 00:00:00;MT;CERRADO"))
    mkzip(zipDir, "focos_2024.zip", Seq(
      "4;2024-05-01 00:00:00;PA;AMAZONIA"))

    val r1 = FocosReport.build(spark, zipDir.getAbsolutePath, cacheDir)
    assert(r1.rebuiltYears.toSet == Set("focos_2023.zip", "focos_2024.zip"))
    val monthly1 = r1.monthly.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(monthly1 == Map("2023-05" -> 2L, "2023-06" -> 1L, "2024-05" -> 1L))

    // rebuild without changes: all partials reused
    val r2 = FocosReport.build(spark, zipDir.getAbsolutePath, cacheDir)
    assert(r2.rebuiltYears.isEmpty &&
      r2.reusedYears.toSet == Set("focos_2023.zip", "focos_2024.zip"))

    // 2024 gets a republication (late data): only 2024 recomputes
    mkzip(zipDir, "focos_2024.zip", Seq(
      "4;2024-05-01 00:00:00;PA;AMAZONIA",
      "5;2024-05-03 00:00:00;PA;AMAZONIA"))
    val r3 = FocosReport.build(spark, zipDir.getAbsolutePath, cacheDir)
    assert(r3.rebuiltYears == Seq("focos_2024.zip") && r3.reusedYears == Seq("focos_2023.zip"))
    val monthly3 = r3.monthly.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(monthly3("2024-05") == 2L)

    // consolidated grand total equals row count per year
    val years = r3.consolidated
      .where("g_period = 1 AND g_state = 1 AND g_biome = 1")
      .collect().map(r => r.getAs[Int]("year") -> r.getAs[Long]("value")).toMap
    assert(years == Map(2023 -> 3L, 2024 -> 2L))

    // step 7: deterministic analysis from the built series (latest
    // period 2024-05; May 2023 had 2 focos -> -50% less 1 vs 2)
    val a = FocosReport.analysis(r3)
    assert(a.keySet == Set("headline", "overview", "comparison", "limitations"))
    assert(a("headline")("pt") == "Mai/2024: 2 focos (0,00% vs Mai/2023).")
    assert(a("headline")("en") == "May/2024: 2 hotspots (0.00% vs May/2023).")
    assert(a("overview")("pt").contains("5 linhas distribuídas em 2 arquivos anuais"))
    assert(a("comparison")("en").contains("Annual total: 2 in 2024 vs 3 in 2023"))
  }
}
