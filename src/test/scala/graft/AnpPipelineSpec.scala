package graft

import java.io.{File, FileOutputStream}
import graft.reports.AnpPipeline

class AnpPipelineSpec extends SparkSpec {

  private def writeCsv(dir: File, name: String, rows: Seq[String]): Unit = {
    val o = new FileOutputStream(new File(dir, name))
    // utf-8-sig: BOM + ';'-separated, pt-BR decimals — the real ANP shape
    o.write(0xEF); o.write(0xBB); o.write(0xBF)
    o.write(("ANO;MÊS;GRANDE REGIÃO;UNIDADE DA FEDERAÇÃO;PRODUÇÃO\n" +
      rows.mkString("\n") + "\n").getBytes("UTF-8"))
    o.close()
  }

  test("end-to-end: locale parse, national series, MoM/YoY, top-N, share") {
    val dir = java.nio.file.Files.createTempDirectory("anp").toFile
    val petro = (1 to 12).flatMap { m =>
      Seq(f"2023;${Seq("JAN","FEV","MAR","ABR","MAI","JUN","JUL","AGO","SET","OUT","NOV","DEZ")(m-1)};Norte;RJ;1.000,50",
          f"2023;${Seq("JAN","FEV","MAR","ABR","MAI","JUN","JUL","AGO","SET","OUT","NOV","DEZ")(m-1)};Norte;SP;500,25")
    } ++ Seq(
      "2024;JAN;Norte;RJ;1.200,00", "2024;JAN;Norte;SP;600,00")
    writeCsv(dir, "petro.csv", petro)
    val gas = (1 to 12).map { m =>
      f"2023;${Seq("JAN","FEV","MAR","ABR","MAI","JUN","JUL","AGO","SET","OUT","NOV","DEZ")(m-1)};Norte;RJ;100,00"
    } ++ Seq("2024;JAN;Norte;RJ;110,00")
    writeCsv(dir, "gas.csv", gas)

    val p = AnpPipeline.loadResource(spark, dir.getAbsolutePath + "/petro.csv")
    val g = AnpPipeline.loadResource(spark, dir.getAbsolutePath + "/gas.csv")

    // locale parse: 1.000,50 + 500,25 = 1500.75 national for 2023-01
    val nat = AnpPipeline.nationalSeries(p, "v").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(nat("2023-01") == 1500.75)
    assert(nat("2024-01") == 1800.0)

    val m = AnpPipeline.momYoyMetrics(p, g).collect().head
    assert(m.getAs[String]("latest_period") == "2024-01")
    // MoM: 1800 vs 2023-12 (1500.75) → (1800/1500.75-1)*100 = 19.94
    assert(m.getAs[Double]("petroleo_mom_pct") == 19.94)
    // YoY: 1800 vs 2023-01 1500.75 → same 19.94; gas 110 vs 100 → 10.0
    assert(m.getAs[Double]("petroleo_yoy_pct") == 19.94)
    assert(m.getAs[Double]("gas_yoy_pct") == 10.0)

    val topn = AnpPipeline.stateSeriesWithOther(p, "2024-01", 2, topN = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(topn(("2024-01", "RJ")) == 1200.0)
    assert(topn(("2024-01", "OUTROS")) == 600.0)
    assert(topn(("2023-12", "RJ")) == 1000.5)

    val share = AnpPipeline.stateShareRows(p, "2024-01").collect()
    assert(share.head.getString(0) == "RJ")
    assert(share.head.getDouble(2) == 66.67)
  }
}
