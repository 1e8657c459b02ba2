package graft.reports

import java.util.Locale

/** Deterministic per-locale analysis text builder — the reference's
  * no-LLM fallback composer (reports/builders/bdqueimadas_overview.py:
  * 1078-1180, formatters :1335-1358, month labels :1689-1712): four
  * sections (headline/overview/comparison/limitations), each rendered
  * in pt and en from the metric tree. Pure driver-side string
  * composition over already-aggregated scalars — no Spark involvement
  * by design (the metrics come from the distributed layer). */
object Fallback {

  private val PtMonths = Vector("Jan", "Fev", "Mar", "Abr", "Mai", "Jun",
    "Jul", "Ago", "Set", "Out", "Nov", "Dez")
  private val EnMonths = Vector("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  private def label(period: String, names: Vector[String]): String =
    if (period == null || !period.contains("-")) Option(period).getOrElse("")
    else {
      val parts = period.split("-", 2)
      parts(1).toIntOption.filter(i => i >= 1 && i <= 12)
        .map(i => s"${names(i - 1)}/${parts(0)}")
        .getOrElse(period)
    }

  /** "2025-08" → "Ago/2025" (bdqueimadas_overview.py:1693-1701). */
  def monthLabelPt(period: String): String = label(period, PtMonths)

  /** "2025-08" → "Aug/2025" (:1704-1712). */
  def monthLabelEn(period: String): String = label(period, EnMonths)

  /** Null on zero base (:1335-1338). */
  def safePctChange(cur: Long, prev: Long): Option[Double] =
    if (prev == 0) None else Some((cur - prev).toDouble / prev * 100.0)

  /** 1234567 → "1.234.567" (:1341-1342). */
  def fmtIntPt(v: Long): String =
    String.format(Locale.US, "%,d", java.lang.Long.valueOf(v)).replace(",", ".")

  /** 1234567 → "1,234,567" (:1345-1346). */
  def fmtIntEn(v: Long): String =
    String.format(Locale.US, "%,d", java.lang.Long.valueOf(v))

  /** 1234.5 → "1.234,50%"; none → "sem base comparável" (:1349-1352). */
  def fmtPctPt(v: Option[Double]): String =
    v.fold("sem base comparável")(x =>
      String.format(Locale.US, "%,.2f", java.lang.Double.valueOf(x))
        .replace(",", "X").replace(".", ",").replace("X", ".") + "%")

  /** 1234.5 → "1,234.50%"; none → "no comparable base" (:1355-1358). */
  def fmtPctEn(v: Option[Double]): String =
    v.fold("no comparable base")(x =>
      String.format(Locale.US, "%,.2f", java.lang.Double.valueOf(x)) + "%")

  /** Inputs mirror _build_fallback_analysis's signature (:1078-1096). */
  case class Metrics(
      firstYear: Int, latestYear: Int, previousYear: Option[Int],
      currentYearTotal: Long, previousYearTotal: Long,
      recent12mTotal: Long, prior12mTotal: Long,
      latestPeriod: String, totalRowsProcessed: Long, fileCountUsed: Int,
      yearRange: String, analysisWindowStart: String, analysisWindowEnd: String,
      latestMonthTotal: Long = 0L, sameMonthPrevYearTotal: Long = 0L,
      ytdCurrentYear: Long = 0L, ytdPreviousYear: Long = 0L)

  /** Section → locale → text (:1098-1180). */
  def buildAnalysis(m: Metrics): Map[String, Map[String, String]] = {
    val yoy = safePctChange(m.currentYearTotal, m.previousYearTotal)
    val recent12mChange = safePctChange(m.recent12mTotal, m.prior12mTotal)
    val momChange = safePctChange(m.latestMonthTotal, m.sameMonthPrevYearTotal)
    val ytdChange = safePctChange(m.ytdCurrentYear, m.ytdPreviousYear)
    val monthPt = monthLabelPt(m.latestPeriod)
    val monthEn = monthLabelEn(m.latestPeriod)

    val (headlinePt, comparisonPt, headlineEn, comparisonEn) = m.previousYear match {
      case None =>
        (s"A base processada cobre ${m.yearRange} e o período mais recente vai até ${m.latestPeriod}, " +
           s"com ${fmtIntPt(m.currentYearTotal)} focos em ${m.latestYear}.",
         "Ainda não há ano anterior processado no escopo atual para comparação anual direta.",
         s"The processed dataset covers ${m.yearRange} and the most recent period reaches ${m.latestPeriod}, " +
           s"with ${fmtIntEn(m.currentYearTotal)} hotspots in ${m.latestYear}.",
         "There is not yet a previous processed year within the current scope for a direct annual comparison.")
      case Some(prevYear) =>
        val prevPeriod = s"$prevYear-${m.latestPeriod.takeRight(2)}"
        (s"$monthPt: ${fmtIntPt(m.latestMonthTotal)} focos " +
           s"(${fmtPctPt(momChange)} vs ${monthLabelPt(prevPeriod)}).",
         s"Comparação mensal ($monthPt): ${fmtIntPt(m.latestMonthTotal)} focos vs " +
           s"${fmtIntPt(m.sameMonthPrevYearTotal)} no mesmo mês de $prevYear (${fmtPctPt(momChange)}). " +
           s"Acumulado jan–$monthPt: ${fmtIntPt(m.ytdCurrentYear)} vs " +
           s"${fmtIntPt(m.ytdPreviousYear)} em $prevYear (${fmtPctPt(ytdChange)}). " +
           s"No total anual: ${fmtIntPt(m.currentYearTotal)} em ${m.latestYear} vs " +
           s"${fmtIntPt(m.previousYearTotal)} em $prevYear (${fmtPctPt(yoy)}).",
         s"$monthEn: ${fmtIntEn(m.latestMonthTotal)} hotspots " +
           s"(${fmtPctEn(momChange)} vs ${monthLabelEn(prevPeriod)}).",
         s"Monthly comparison ($monthEn): ${fmtIntEn(m.latestMonthTotal)} hotspots vs " +
           s"${fmtIntEn(m.sameMonthPrevYearTotal)} in the same month of $prevYear (${fmtPctEn(momChange)}). " +
           s"YTD Jan–$monthEn: ${fmtIntEn(m.ytdCurrentYear)} vs " +
           s"${fmtIntEn(m.ytdPreviousYear)} in $prevYear (${fmtPctEn(ytdChange)}). " +
           s"Annual total: ${fmtIntEn(m.currentYearTotal)} in ${m.latestYear} vs " +
           s"${fmtIntEn(m.previousYearTotal)} in $prevYear (${fmtPctEn(yoy)}).")
    }

    val overviewPt =
      s"Foram processadas ${fmtIntPt(m.totalRowsProcessed)} linhas distribuídas em ${m.fileCountUsed} arquivos anuais. " +
        s"Na janela editorial recente de ${m.analysisWindowStart} a ${m.analysisWindowEnd}, " +
        s"os 12 meses mais recentes somam ${fmtIntPt(m.recent12mTotal)} focos, " +
        s"contra ${fmtIntPt(m.prior12mTotal)} nos 12 meses imediatamente anteriores, " +
        s"o que corresponde a ${fmtPctPt(recent12mChange)}."

    val limitationsPt =
      "O texto é descritivo e não estabelece causalidade. " +
        "A leitura editorial permanece concentrada na janela recente, embora as visualizações publiquem o histórico disponível. " +
        "O ano corrente pode estar incompleto."

    val overviewEn =
      s"${fmtIntEn(m.totalRowsProcessed)} rows were processed across ${m.fileCountUsed} annual files. " +
        s"In the recent editorial window from ${m.analysisWindowStart} to ${m.analysisWindowEnd}, " +
        s"the latest 12 months total ${fmtIntEn(m.recent12mTotal)} hotspots, " +
        s"versus ${fmtIntEn(m.prior12mTotal)} in the immediately previous 12 months, " +
        s"which corresponds to ${fmtPctEn(recent12mChange)}."

    val limitationsEn =
      "This text is descriptive and does not establish causality. " +
        "The editorial reading remains focused on the recent window, although the visualizations publish the available history. " +
        "The current year may be incomplete."

    def localized(pt: String, en: String) = Map("pt" -> pt.trim, "en" -> en.trim)
    Map(
      "headline" -> localized(headlinePt, headlineEn),
      "overview" -> localized(overviewPt, overviewEn),
      "comparison" -> localized(comparisonPt, comparisonEn),
      "limitations" -> localized(limitationsPt, limitationsEn))
  }
}
