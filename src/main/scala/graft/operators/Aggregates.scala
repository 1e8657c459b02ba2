package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.core.Cols._

/** Aggregation operators (SURVEY.md §2.4).
  *
  * Each function is a pure DataFrame program: one declarative plan, no
  * driver-side loops, no collects. At 100 TB each of these is a single
  * shuffle (hash partial→final aggregation); grouping sets are one pass
  * over the scan instead of the reference's 8 separate pandas group-bys
  * (reference: reports/builders/bdqueimadas_incremental.py:403-471).
  */
object Aggregates {

  /** TPC-H-Q1-style pricing summary: the A1-lite core group-by.
    * Exact decimal sums → hash partial aggregation, one shuffle. */
  def pricingSummary(li: DataFrame): DataFrame =
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  /** The reference's 8-way grouping-set count engine (A1) re-expressed as
    * ONE `GROUPING SETS` pass — one scan + one shuffle where the reference
    * runs 8 pandas group-bys (bdqueimadas_incremental.py:403-471).
    * period↔period_month, state↔l_returnflag, biome↔l_linestatus. */
  def groupingSetCounts(li: DataFrame): DataFrame = {
    val spark = li.sparkSession
    val v = "gs_lineitem_" + java.util.UUID.randomUUID.toString.replace("-", "")
    li.createOrReplaceTempView(v)
    // Pre-aggregate to the finest granularity BEFORE the grouping-set
    // expansion: Expand multiplies its input ×8, so feeding it the
    // (period, state, biome) partials (hundreds of rows) instead of raw
    // rows keeps the ×8 blow-up off the 100 TB scan. COUNT becomes
    // SUM(partial count) — identical results, exact arithmetic.
    val out = spark.sql(s"""
      SELECT period, yr, state, biome, SUM(cnt) AS value,
             CAST(GROUPING(period) AS INT) AS g_period,
             CAST(GROUPING(state)  AS INT) AS g_state,
             CAST(GROUPING(biome)  AS INT) AS g_biome
      FROM (SELECT date_format(l_shipdate, 'yyyy-MM') AS period,
                   year(l_shipdate) AS yr,
                   l_returnflag AS state, l_linestatus AS biome,
                   COUNT(*) AS cnt
            FROM $v
            GROUP BY 1, 2, 3, 4)
      GROUP BY GROUPING SETS (
        (period, yr), (period, yr, biome), (yr), (yr, biome),
        (yr, state), (yr, state, biome), (period, yr, state),
        (period, yr, state, biome))
      ORDER BY g_period, g_state, g_biome, yr,
               coalesce(period, ''), coalesce(state, ''), coalesce(biome, '')
    """)
    spark.catalog.dropTempView(v)
    out
  }

  /** Distinct non-null dimension values, sorted (A2,
    * bdqueimadas_incremental.py:473-479). */
  def distinctFlags(li: DataFrame): DataFrame =
    li.select(col("l_returnflag"), col("l_linestatus"))
      .where(col("l_returnflag").isNotNull)
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** Min/max month span + row count (A3, bdqueimadas_incremental.py:486-487). */
  def monthSpan(li: DataFrame): DataFrame =
    li.agg(
      min(period(col("l_shipdate"))).as("min_month"),
      max(period(col("l_shipdate"))).as("max_month"),
      count(lit(1)).as("cnt"))

  /** Partial→final merge-sum (A4): per-(month,key) partial aggregates are
    * re-aggregated to key totals — the durable-partials pattern behind the
    * reference's incremental year-payload cache
    * (bdqueimadas_incremental.py:1051-1064, :186-263). Spark's hash agg
    * does partial/final natively; this makes the partials an explicit
    * intermediate so a cache layer can persist them per year. */
  def partialMergeSum(li: DataFrame): DataFrame = {
    val partials = li
      .groupBy(period(col("l_shipdate")).as("m"), col("l_returnflag"))
      .agg(count(lit(1)).as("pcnt"),
           sum(col("l_quantity").cast(DecimalType(18, 2))).as("pqty"))
    partials
      .groupBy("l_returnflag")
      .agg(sum("pcnt").as("cnt"), sum("pqty").cast(DoubleType).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Per-month counts + revenue (A8, bdqueimadas_overview.py:1861-1940). */
  def monthlyCounts(li: DataFrame): DataFrame =
    li.groupBy(period(col("l_shipdate")).as("m"))
      .agg(count(lit(1)).as("cnt"),
           drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy("m")

  /** Sentinel union of "all" + per-dimension aggregates (D3,
    * bdqueimadas_incremental.py:266-289): same shape as a grouping-set
    * output with an explicit `__ALL__` marker. ONE scan: pre-aggregate
    * to (m, flag) partials, then GROUPING SETS ((m), (m, flag)) over the
    * partials — the round-1 two-branch union scanned lineitem twice. */
  def sentinelUnion(li: DataFrame): DataFrame = {
    val spark = li.sparkSession
    val v = "su_lineitem_" + java.util.UUID.randomUUID.toString.replace("-", "")
    li.createOrReplaceTempView(v)
    val out = spark.sql(s"""
      SELECT m,
             CASE WHEN GROUPING(flag) = 1 THEN '__ALL__' ELSE flag END AS flag,
             SUM(cnt) AS cnt
      FROM (SELECT date_format(l_shipdate, 'yyyy-MM') AS m,
                   l_linestatus AS flag, COUNT(*) AS cnt
            FROM $v GROUP BY 1, 2)
      GROUP BY GROUPING SETS ((m), (m, flag))
      ORDER BY m, flag
    """)
    spark.catalog.dropTempView(v)
    out
  }

  /** Membership (YTD-style) sum over an explicit month set (P9/A5,
    * bdqueimadas_overview.py:301-331). */
  def ytdMembership(li: DataFrame, months: Seq[String]): DataFrame =
    li.where(period(col("l_shipdate")).isin(months: _*))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))

  /** Zero-filled counts over a generated day domain (A15,
    * social/bdqueimadas_daily/pipeline.py:409-417): left join the domain
    * with observed counts, missing days → 0. */
  def zeroFilledDays(events: DataFrame, from: String, to: String): DataFrame = {
    val domain = events.sparkSession.range(1).select(
      explode(sequence(
        to_date(lit(from)), to_date(lit(to)))).as("day"))
    val counts = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    domain.join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("cnt"))
      .orderBy("day")
  }

  /** Column-profile aggregates (A22, social/anp_producao/pipeline.py:269-285):
    * per-source row counts, distinct/null counts, value span. */
  def profileStats(docs: DataFrame): DataFrame =
    docs.groupBy("source")
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("text").isNull.cast("int")).as("null_text"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("source")

  /** 2-D density histogram (the daily pipeline's hexbin map,
    * social/bdqueimadas_daily/pipeline.py:621-683, as a rectangular-bin
    * groupBy — one shuffle at any scale; rendering is driver-side). */
  def histogram2d(df: DataFrame, x: org.apache.spark.sql.Column,
                  y: org.apache.spark.sql.Column,
                  xBin: Double, yBin: Double): DataFrame =
    df.select(floor(x / xBin).cast("long").as("xb"),
              floor(y / yBin).cast("long").as("yb"))
      .groupBy("xb", "yb").agg(count(lit(1)).as("cnt"))
      .orderBy("xb", "yb")

  /** Salted two-phase aggregation for skewed keys (SURVEY scale note:
    * "skewed keys → salting or AQE skew-join"): phase 1 aggregates
    * (key, salt) partials, phase 2 merges per key — the hot key's rows
    * spread across `salts` reducers instead of one. */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("pcnt"))
      .groupBy(col(key)).agg(sum("pcnt").as("cnt"))

  /** Distinct preview in first-seen order (A18, audits/utils.py:152-160):
    * first k distinct values of a column ordered by first appearance. */
  def distinctPreview(docs: DataFrame, column: String, k: Int): DataFrame =
    docs.groupBy(col(column).as("value"))
      .agg(min(col("doc_id")).as("first_seen"))
      .orderBy("first_seen")
      .limit(k)

  /** Type inference by ratio (A17, audits/utils.py:126-149): per column,
    * numeric-parse ratio and distinct count drive a type verdict. */
  def typeInfer(docs: DataFrame): DataFrame = {
    def colStats(name: String): DataFrame = {
      val c = col(name).cast("string")
      docs.agg(
        lit(name).as("col_name"),
        (sum(c.rlike("^[0-9]+$").cast("int")) / count(lit(1))).as("numeric_ratio"),
        (sum(try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")).isNotNull.cast("int")) /
          count(lit(1))).as("dt_ratio"),
        countDistinct(c).as("n_distinct"),
        count(lit(1)).as("n"))
    }
    val stats = Seq("doc_id", "lang", "n_chars").map(colStats).reduce(_ unionByName _)
    stats.select(
      col("col_name"), col("numeric_ratio"), col("dt_ratio"), col("n_distinct"),
      when(col("numeric_ratio") >= 0.95, "int")
        .when(col("dt_ratio") >= 0.8, "datetime")
        .when(col("n_distinct") <= 5 && col("n") >= 10, "categorical")
        .otherwise("string").as("inferred"))
      .orderBy("col_name")
  }
}
