package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Normalize

/** Relational cores of the reference's source-discovery scrapers
  * (SURVEY.md §2.1 S9–S12 note: HTTP/HTML is driver-side; what belongs
  * in the engine is the work-list algebra — period extraction from
  * filenames, sort-desc/latest-N selection (O5/O6), URL policy
  * predicates (P10)). Input: a listing DataFrame (url, filename).
  */
object Discovery {

  /** Parse periods from filenames, keep the latest N resources
    * (O5: datasets/cvm/ckan_dataset.py:267-275; O6 family sorts). */
  def selectLatest(listing: DataFrame, n: Int): DataFrame =
    listing
      .withColumn("period", Normalize.extractPeriod(col("filename")))
      .where(col("period").isNotNull)
      .orderBy(col("period").desc, col("url").asc)
      .limit(n)

  /** Calendar-year filter on yyyymm keys (P13,
    * datasets/inpe/bdqueimadas_mensal_listing.py:41-45). */
  def yearFilter(listing: DataFrame, year: Int): DataFrame = {
    val ym = regexp_extract(col("filename"), "((?:19|20)\\d{4})", 1)
    listing
      .withColumn("yyyymm", when(ym === "", lit(null).cast("int")).otherwise(ym.cast("int")))
      .where(floor(col("yyyymm") / 100) === year)
  }

  /** URL policy predicates (P10: https + allow-listed host + suffix
    * allow-list + exclude regex; datasets/supranational/runner.py:467-505,
    * datasets/cvm/ckan_dataset.py:185-234). Pure column predicates —
    * regexp host extraction keeps it engine-portable. */
  def urlPolicy(url: Column, allowedHosts: Seq[String],
                allowedSuffixes: Seq[String], excludePattern: String): Column = {
    val host = regexp_extract(url, "^https://([^/]+)/", 1)
    val suffixOk = allowedSuffixes.map(s => url.endsWith(s)).reduce(_ || _)
    host.isin(allowedHosts: _*) && suffixOk && !url.rlike(excludePattern)
  }

  def policyFilter(listing: DataFrame, allowedHosts: Seq[String],
                   allowedSuffixes: Seq[String], excludePattern: String): DataFrame =
    listing.where(urlPolicy(col("url"), allowedHosts, allowedSuffixes, excludePattern))
}

/** Schema audit (SURVEY.md §2.4 A16; reference:
  * audits/inpe/bdqueimadas_focos.py:62-155, audits/utils.py:163-176):
  * column-presence counts across files, modal exact schema,
  * intersection/union membership. Input: (file, cols array<string>). */
object Audit {

  /** Glue: (file, cols) audit frame from profiler output — the A16 input
    * shape straight from `Profiler.profilePath` results. */
  def fromProfiles(spark: org.apache.spark.sql.SparkSession,
                   profiles: Seq[graft.profile.ResourceProfile]): DataFrame = {
    import spark.implicits._
    profiles.map(p => (p.path, p.columns)).toDF("file", "cols")
  }

  /** Per-column presence: files containing it + whether it is in every
    * file (intersection member). */
  def schemaPresence(files: DataFrame): DataFrame = {
    val total = files.select(countDistinct(col("file")).as("files_total"))
    files.select(col("file"), explode(col("cols")).as("column"))
      .distinct()
      .groupBy("column").agg(countDistinct(col("file")).as("files_present"))
      .crossJoin(broadcast(total))
      .withColumn("in_all", col("files_present") === col("files_total"))
      .orderBy("column")
  }

  /** Modal schema: the most frequent exact column list (ties → first by
    * signature for determinism). */
  def modalSchema(files: DataFrame): DataFrame =
    files.groupBy(col("cols")).agg(count(lit(1)).as("n_files"))
      .orderBy(col("n_files").desc, concat_ws("|", col("cols")).asc)
      .limit(1)

  /** Files diverging from the modal schema, with their delta columns. */
  def divergentFiles(files: DataFrame): DataFrame = {
    val modal = modalSchema(files).select(col("cols").as("modal_cols"))
    files.crossJoin(broadcast(modal))
      .where(col("cols") =!= col("modal_cols"))
      .select(col("file"),
        array_except(col("cols"), col("modal_cols")).as("extra"),
        array_except(col("modal_cols"), col("cols")).as("missing"))
      .orderBy("file")
  }
}
