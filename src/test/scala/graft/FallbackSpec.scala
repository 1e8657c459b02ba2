package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.reports.Fallback

/** Golden pt/en strings for the deterministic fallback analysis builder
  * (reference bdqueimadas_overview.py:1078-1180). Goldens were computed
  * with the reference's exact Python f-string formatters. */
class FallbackSpec extends AnyFunSuite {

  private val base = Fallback.Metrics(
    firstYear = 2019, latestYear = 2025, previousYear = Some(2024),
    currentYearTotal = 136393L, previousYearTotal = 278299L,
    recent12mTotal = 250000L, prior12mTotal = 200000L,
    latestPeriod = "2025-08", totalRowsProcessed = 1409866L, fileCountUsed = 7,
    yearRange = "2019–2025", analysisWindowStart = "2024-09",
    analysisWindowEnd = "2025-08",
    latestMonthTotal = 30123L, sameMonthPrevYearTotal = 28000L,
    ytdCurrentYear = 90000L, ytdPreviousYear = 110000L)

  test("with a previous year: month-comparison headline + full comparison") {
    val a = Fallback.buildAnalysis(base)
    assert(a("headline")("pt") == "Ago/2025: 30.123 focos (7,58% vs Ago/2024).")
    assert(a("headline")("en") == "Aug/2025: 30,123 hotspots (7.58% vs Aug/2024).")
    assert(a("comparison")("pt") ==
      "Comparação mensal (Ago/2025): 30.123 focos vs 28.000 no mesmo mês de 2024 (7,58%). " +
        "Acumulado jan–Ago/2025: 90.000 vs 110.000 em 2024 (-18,18%). " +
        "No total anual: 136.393 em 2025 vs 278.299 em 2024 (-50,99%).")
    assert(a("comparison")("en") ==
      "Monthly comparison (Aug/2025): 30,123 hotspots vs 28,000 in the same month of 2024 (7.58%). " +
        "YTD Jan–Aug/2025: 90,000 vs 110,000 in 2024 (-18.18%). " +
        "Annual total: 136,393 in 2025 vs 278,299 in 2024 (-50.99%).")
    assert(a("overview")("pt") ==
      "Foram processadas 1.409.866 linhas distribuídas em 7 arquivos anuais. " +
        "Na janela editorial recente de 2024-09 a 2025-08, " +
        "os 12 meses mais recentes somam 250.000 focos, " +
        "contra 200.000 nos 12 meses imediatamente anteriores, " +
        "o que corresponde a 25,00%.")
    assert(a("overview")("en") ==
      "1,409,866 rows were processed across 7 annual files. " +
        "In the recent editorial window from 2024-09 to 2025-08, " +
        "the latest 12 months total 250,000 hotspots, " +
        "versus 200,000 in the immediately previous 12 months, " +
        "which corresponds to 25.00%.")
    assert(a("limitations")("pt").startsWith("O texto é descritivo"))
    assert(a("limitations")("en").startsWith("This text is descriptive"))
  }

  test("without a previous year: coverage headline, no-comparison text") {
    val a = Fallback.buildAnalysis(base.copy(previousYear = None))
    assert(a("headline")("pt") ==
      "A base processada cobre 2019–2025 e o período mais recente vai até 2025-08, " +
        "com 136.393 focos em 2025.")
    assert(a("headline")("en") ==
      "The processed dataset covers 2019–2025 and the most recent period reaches 2025-08, " +
        "with 136,393 hotspots in 2025.")
    assert(a("comparison")("pt") ==
      "Ainda não há ano anterior processado no escopo atual para comparação anual direta.")
    assert(a("comparison")("en") ==
      "There is not yet a previous processed year within the current scope for a direct annual comparison.")
  }

  test("formatters: zero base -> localized no-base text; month label fallbacks") {
    assert(Fallback.safePctChange(10, 0).isEmpty)
    assert(Fallback.fmtPctPt(None) == "sem base comparável")
    assert(Fallback.fmtPctEn(None) == "no comparable base")
    assert(Fallback.fmtPctPt(Some(-18.181818)) == "-18,18%")
    assert(Fallback.fmtPctPt(Some(1234.5)) == "1.234,50%")
    assert(Fallback.fmtPctEn(Some(1234.5)) == "1,234.50%")
    assert(Fallback.monthLabelPt("2025") == "2025")     // no month part
    assert(Fallback.monthLabelPt(null) == "")
    assert(Fallback.monthLabelEn("2025-13") == "2025-13") // invalid month
  }
}
