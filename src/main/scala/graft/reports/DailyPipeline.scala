package graft.reports

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Coerce, Normalize}
import graft.sources.ZipCsv

/** The daily focos social pipeline (SURVEY.md §3.3; reference:
  * social/bdqueimadas_daily/pipeline.py:131-334): 7-day listing window
  * with the exclude-incomplete-day rule → exact-match satellite filter →
  * daily counts → top-N municipalities + "Outros" → region totals via a
  * broadcast state→region dimension (accent-normalized) → max-day /
  * share highlights.
  */
object DailyPipeline {

  /** Brazilian UF → macro-region (public-knowledge dimension; the
    * reference embeds the same mapping, daily/pipeline.py:46-103). */
  val StateRegion: Seq[(String, String)] = Seq(
    "AC" -> "Norte", "AP" -> "Norte", "AM" -> "Norte", "PA" -> "Norte",
    "RO" -> "Norte", "RR" -> "Norte", "TO" -> "Norte",
    "AL" -> "Nordeste", "BA" -> "Nordeste", "CE" -> "Nordeste",
    "MA" -> "Nordeste", "PB" -> "Nordeste", "PE" -> "Nordeste",
    "PI" -> "Nordeste", "RN" -> "Nordeste", "SE" -> "Nordeste",
    "DF" -> "Centro-Oeste", "GO" -> "Centro-Oeste", "MT" -> "Centro-Oeste",
    "MS" -> "Centro-Oeste",
    "ES" -> "Sudeste", "MG" -> "Sudeste", "RJ" -> "Sudeste", "SP" -> "Sudeste",
    "PR" -> "Sul", "RS" -> "Sul", "SC" -> "Sul")

  /** Full state names → UF for accent-normalized matching. */
  val StateNameToUf: Seq[(String, String)] = Seq(
    "acre" -> "AC", "amapa" -> "AP", "amazonas" -> "AM", "para" -> "PA",
    "rondonia" -> "RO", "roraima" -> "RR", "tocantins" -> "TO",
    "alagoas" -> "AL", "bahia" -> "BA", "ceara" -> "CE", "maranhao" -> "MA",
    "paraiba" -> "PB", "pernambuco" -> "PE", "piaui" -> "PI",
    "rio grande do norte" -> "RN", "sergipe" -> "SE",
    "distrito federal" -> "DF", "goias" -> "GO", "mato grosso" -> "MT",
    "mato grosso do sul" -> "MS",
    "espirito santo" -> "ES", "minas gerais" -> "MG",
    "rio de janeiro" -> "RJ", "sao paulo" -> "SP",
    "parana" -> "PR", "rio grande do sul" -> "RS", "santa catarina" -> "SC")

  val ReferenceSatellite = "AQUA_M-T"

  val Roles: Seq[(String, Seq[String])] = Seq(
    "data_hora_gmt" -> Seq("data_hora_gmt", "datahora"),
    "satelite" -> Seq("satelite"),
    "municipio" -> Seq("municipio"),
    "estado" -> Seq("estado"),
    "bioma" -> Seq("bioma"))

  /** 7-day listing window (P12, pipeline.py:353-369): periods ≤ asOf,
    * excluding asOf itself when it is today (incomplete day), last n. */
  def selectWindow(listing: DataFrame, asOf: String, n: Int,
                   excludeAsOf: Boolean): DataFrame = {
    val dated = listing.withColumn("day",
      to_date(regexp_extract(col("filename"), "(\\d{8})", 1), "yyyyMMdd"))
    val bounded =
      if (excludeAsOf) dated.where(col("day") < asOf)
      else dated.where(col("day") <= asOf)
    bounded.orderBy(col("day").desc).limit(n)
  }

  /** Load daily CSVs → normalized (day, municipio, estado, bioma) with
    * the exact-match satellite filter (pipeline.py:399-406). */
  def load(spark: SparkSession, glob: String): DataFrame =
    ZipCsv.readCsvs(spark, glob, Roles)
      .where(trim(col("satelite")) === ReferenceSatellite)
      .withColumn("dt", Coerce.toTimestampCoerce(col("data_hora_gmt")))
      .where(col("dt").isNotNull)
      .select(to_date(col("dt")).as("day"),
        trim(col("municipio")).as("municipio"),
        trim(col("estado")).as("estado"),
        trim(col("bioma")).as("bioma"))

  /** Daily counts (A15 core). */
  def dailyCounts(df: DataFrame): DataFrame =
    df.groupBy("day").agg(count(lit(1)).as("cnt")).orderBy("day")

  /** Top-N + "Outros" (A9, pipeline.py:420-430). */
  def topNOther(df: DataFrame, keyCol: String, n: Int): DataFrame = {
    val per = df.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
    per.withColumn("rn", row_number().over(
        Window.orderBy(col("cnt").desc, col(keyCol).asc)))
      .withColumn("label", when(col("rn") <= n, col(keyCol)).otherwise(lit("Outros")))
      .groupBy("label").agg(sum("cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("label").asc)
  }

  /** Region totals via broadcast dimension with accent-normalized state
    * names (J8, pipeline.py:433-453). */
  def regionRank(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nameDim = StateNameToUf.toDF("state_key", "uf")
    val regionDim = StateRegion.toDF("uf2", "region")
    val dim = nameDim.join(regionDim, col("uf") === col("uf2"))
      .select(col("state_key"), col("uf"), col("region"))
    df.withColumn("state_key",
        lower(graft.functions.StripAccents(col("estado")))) // codegen expr, not UDF
      .join(broadcast(dim), Seq("state_key"), "left")
      .groupBy(coalesce(col("region"), lit("Desconhecida")).as("region"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("region").asc)
  }

  /** Max-day highlight (A12) + share of the max day (A11). */
  def highlights(df: DataFrame): DataFrame = {
    val daily = df.groupBy("day").agg(count(lit(1)).as("cnt"))
    daily
      .withColumn("total", sum("cnt").over(Window.partitionBy()))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("cnt").desc, col("day").asc)))
      .where(col("rn") === 1)
      .select(col("day").as("max_day"), col("cnt").as("max_cnt"),
        (col("cnt").cast("double") / col("total") * 100).as("max_share_pct"))
  }
}
