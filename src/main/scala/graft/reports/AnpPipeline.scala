package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.functions.{Coerce, Normalize}
import graft.sources.ZipCsv

/** The ANP production social pipeline (SURVEY.md §3.3; reference:
  * social/anp_producao/pipeline.py): ';'-separated utf-8-sig CSVs with
  * pt-BR decimals → national monthly series → MoM/YoY on the inner-joined
  * positive months → top-8 states + OUTROS over a trailing window →
  * share-of-total rows.
  *
  * All heavy steps are distributed; only the final scalar metrics
  * collect (a handful of values, mirroring the reference's PeriodMetrics).
  */
object AnpPipeline {

  val Roles: Seq[(String, Seq[String])] = Seq(
    "ano" -> Seq("ANO"),
    "mes" -> Seq("MÊS", "MES"),
    "uf" -> Seq("UNIDADE DA FEDERAÇÃO", "UF"),
    "localizacao" -> Seq("LOCALIZAÇÃO", "LOCALIZACAO"),
    "valor" -> Seq("PRODUÇÃO", "PRODUCAO", "VALOR"))

  /** Load one resource: sniffed CSV scan → typed (periodo "yyyy-MM",
    * uf, valor) with pt-BR numeric coercion
    * (load_resource_frame, pipeline.py:248-266). */
  def loadResource(spark: SparkSession, glob: String): DataFrame = {
    val raw = ZipCsv.readCsvs(spark, glob, Roles)
    val ano = Coerce.toLongCoerce(col("ano"))
    val mes = Normalize.ptMonthToNum(col("mes"))
    raw.select(
        concat(ano.cast("string"), lit("-"), lpad(mes.cast("string"), 2, "0"))
          .as("periodo"),
        trim(col("uf")).as("uf"),
        Coerce.ptbrDecimal(col("valor")).as("valor"))
      .where(col("periodo").isNotNull)
  }

  /** National monthly series (national_series, pipeline.py:289-291). */
  def nationalSeries(df: DataFrame, valueName: String): DataFrame =
    df.groupBy("periodo")
      .agg(sum(col("valor").cast(DecimalType(18, 2))).cast(DoubleType).as(valueName))
      .orderBy("periodo")

  /** pct_delta: (new/old - 1) × 100 rounded to 2, null on zero base
    * (pipeline.py:322-325). */
  private def pctDelta(cur: org.apache.spark.sql.Column, old: org.apache.spark.sql.Column) =
    when(old.isNull || old === 0, lit(null).cast(DoubleType))
      .otherwise(round((cur / old - 1) * 100, 2))

  /** Latest-vs-previous-vs-YoY metrics over the inner-merged positive
    * months (latest_common_positive_metrics, pipeline.py:293-319):
    * MoM = previous positive row (lag), YoY = exact -12-months match —
    * null when absent (the reference raises; we surface null). */
  def momYoyMetrics(petroleum: DataFrame, gas: DataFrame): DataFrame = {
    val combo = nationalSeries(petroleum, "petroleo")
      .join(nationalSeries(gas, "gas"), Seq("periodo"), "inner")
      .where(col("petroleo") > 0 && col("gas") > 0)
    val w = Window.orderBy("periodo")
    val yoyKey = concat((substring(col("periodo"), 1, 4).cast("int") - 1).cast("string"),
      lit("-"), substring(col("periodo"), 6, 2))
    val prevs = combo.select(col("periodo").as("p_yoy"),
      col("petroleo").as("petroleo_yoy"), col("gas").as("gas_yoy"))
    combo
      .withColumn("petroleo_prev", lag("petroleo", 1).over(w))
      .withColumn("gas_prev", lag("gas", 1).over(w))
      .withColumn("rn", row_number().over(Window.orderBy(col("periodo").desc)))
      .where(col("rn") === 1).drop("rn")
      .join(prevs, yoyKey === col("p_yoy"), "left")
      .select(
        col("periodo").as("latest_period"),
        col("petroleo"), pctDelta(col("petroleo"), col("petroleo_prev")).as("petroleo_mom_pct"),
        pctDelta(col("petroleo"), col("petroleo_yoy")).as("petroleo_yoy_pct"),
        col("gas"), pctDelta(col("gas"), col("gas_prev")).as("gas_mom_pct"),
        pctDelta(col("gas"), col("gas_yoy")).as("gas_yoy_pct"))
  }

  /** Top-N states at the latest period + OUTROS over the trailing window
    * (state_series_with_other, pipeline.py:328-344). */
  def stateSeriesWithOther(df: DataFrame, latestPeriod: String,
                           recentMonths: Int, topN: Int = 8): DataFrame = {
    val state = df.groupBy("periodo", "uf")
      .agg(sum(col("valor").cast(DecimalType(18, 2))).as("valor"))
    val top = state.where(col("periodo") === latestPeriod && col("valor") > 0)
      .orderBy(col("valor").desc, col("uf").asc).limit(topN)
      .select(col("uf").as("top_uf"))
    val start = add_months(to_date(concat(lit(latestPeriod), lit("-01"))), -(recentMonths - 1))
    state
      .where(to_date(concat(col("periodo"), lit("-01"))).between(start,
        to_date(concat(lit(latestPeriod), lit("-01")))))
      .join(broadcast(top), col("uf") === col("top_uf"), "left")
      .withColumn("series", coalesce(col("top_uf"), lit("OUTROS")))
      .groupBy("periodo", "series")
      .agg(sum("valor").cast(DoubleType).as("valor"))
      .orderBy("periodo", "series")
  }

  /** Share-of-total rows at the latest period
    * (state_share_rows, pipeline.py:347-366). */
  def stateShareRows(df: DataFrame, latestPeriod: String, limit: Int = 8): DataFrame = {
    val latest = df.where(col("periodo") === latestPeriod)
      .groupBy("uf").agg(sum(col("valor").cast(DecimalType(18, 2))).as("valor"))
      .where(col("valor") > 0)
    latest
      .withColumn("total", sum("valor").over(Window.partitionBy()))
      .select(col("uf"), round(col("valor").cast(DoubleType), 2).as("value"),
        round(col("valor").cast(DoubleType) / col("total").cast(DoubleType) * 100, 2)
          .as("share_pct"))
      .orderBy(col("value").desc, col("uf").asc)
      .limit(limit)
  }
}
