package graft

import java.io.{File, FileOutputStream}
import graft.reports.DailyPipeline

class DailyPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("selectWindow: ≤ asOf, exclude incomplete day, last n") {
    val listing = Seq(
      ("u1", "focos_diario_br_20240110.csv"), ("u2", "focos_diario_br_20240111.csv"),
      ("u3", "focos_diario_br_20240112.csv"), ("u4", "focos_diario_br_20240113.csv"))
      .toDF("url", "filename")
    val out = DailyPipeline.selectWindow(listing, "2024-01-13", 2, excludeAsOf = true)
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("u3", "u2")) // 13th excluded (incomplete), last 2
    val inc = DailyPipeline.selectWindow(listing, "2024-01-13", 2, excludeAsOf = false)
      .collect().map(_.getString(0))
    assert(inc.toSeq == Seq("u4", "u3"))
  }

  test("end-to-end: satellite filter, region rank with accents, highlights") {
    val dir = java.nio.file.Files.createTempDirectory("daily").toFile
    val csv =
      """data_hora_gmt,satelite,municipio,estado,bioma
        |2024-01-10 12:00:00,AQUA_M-T,Altamira,Pará,Amazônia
        |2024-01-10 13:00:00,AQUA_M-T,Altamira,Pará,Amazônia
        |2024-01-10 14:00:00,TERRA,Altamira,Pará,Amazônia
        |2024-01-11 09:00:00,AQUA_M-T,Sorriso,Mato Grosso,Cerrado
        |2024-01-11 10:00:00,AQUA_M-T,Campinas,São Paulo,Mata Atlântica
        |""".stripMargin
    val o = new FileOutputStream(new File(dir, "focos_diario_br_20240110.csv"))
    o.write(csv.getBytes("UTF-8")); o.close()

    val df = DailyPipeline.load(spark, dir.getAbsolutePath + "/*.csv")
    assert(df.count() == 4) // TERRA row dropped

    val daily = DailyPipeline.dailyCounts(df).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(daily == Map("2024-01-10" -> 2L, "2024-01-11" -> 2L))

    val regions = DailyPipeline.regionRank(df).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(regions == Map("Norte" -> 2L, "Centro-Oeste" -> 1L, "Sudeste" -> 1L))

    val top = DailyPipeline.topNOther(df, "municipio", 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top == Map("Altamira" -> 2L, "Outros" -> 2L))

    val h = DailyPipeline.highlights(df).collect().head
    assert(h.getDate(0).toString == "2024-01-10" && h.getLong(1) == 2L)
    assert(h.getDouble(2) == 50.0)
  }
}
