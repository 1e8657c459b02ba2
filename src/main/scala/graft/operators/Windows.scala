package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
import graft.core.Cols._

/** Window-function operators (SURVEY.md §2.5, §2.4 A6-A12, A20).
  *
  * The reference hand-rolls every windowed computation over sorted pandas
  * frames; here each is a single `Window` spec. Scale note: unpartitioned
  * `Window.orderBy` pulls everything to one partition — acceptable ONLY
  * because these windows run over already-aggregated month series
  * (dozens–hundreds of rows); all per-row windows below are partitioned
  * by a key so they distribute.
  */
object Windows {

  /** Monthly order revenue — the small series the month-window ops run on. */
  private def monthlyRevenue(orders: DataFrame): DataFrame =
    orders.groupBy(period(col("o_orderdate")).as("m"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_dec"),
           count(lit(1)).as("cnt"))

  /** Rolling 12-month totals vs the preceding 12-month window, with a
    * completeness guard (A6, bdqueimadas_overview.py:1821-1858): prior
    * window is null unless all 12 months are present. */
  def rolling12(orders: DataFrame): DataFrame = {
    val w = Window.orderBy("m")
    val cur = w.rowsBetween(-11, 0)
    val prior = w.rowsBetween(-23, -12)
    monthlyRevenue(orders)
      .select(
        col("m"),
        col("rev_dec").cast(DoubleType).as("revenue"),
        sum(col("rev_dec")).over(cur).cast(DoubleType).as("r12"),
        when(count(lit(1)).over(prior) === 12,
             sum(col("rev_dec")).over(prior).cast(DoubleType))
          .otherwise(lit(null).cast(DoubleType)).as("r12_prior"))
      .withColumn("r12_pct", safePct(col("r12"), col("r12_prior")))
      .orderBy("m")
  }

  /** MoM / YoY via lag(1) / lag(12) over the dense month series (J4,
    * social/anp_producao/pipeline.py:293-319), pct null-on-zero. */
  def momYoy(orders: DataFrame): DataFrame = {
    val w = Window.orderBy("m")
    monthlyRevenue(orders)
      .select(
        col("m"),
        col("rev_dec").cast(DoubleType).as("revenue"),
        lag(col("rev_dec"), 1).over(w).cast(DoubleType).as("prev_m"),
        lag(col("rev_dec"), 12).over(w).cast(DoubleType).as("prev_y"))
      .withColumn("mom_pct", safePct(col("revenue"), col("prev_m")))
      .withColumn("yoy_pct", safePct(col("revenue"), col("prev_y")))
      .orderBy("m")
  }

  /** Top-k months by |MoM pct| with null→0 (O2,
    * bdqueimadas_overview.py:1521-1535), deterministic tiebreak on month. */
  def topkByAbsPct(orders: DataFrame, k: Int): DataFrame =
    momYoy(orders)
      .select(col("m"), coalesce(col("mom_pct"), lit(0.0)).as("mom_pct"))
      .orderBy(abs(col("mom_pct")).desc, col("m").asc)
      .limit(k)

  /** 5-closed-year per-calendar-month average, zero months excluded (A7,
    * bdqueimadas_overview.py:1969-1981). */
  def fiveYearMonthlyAvg(orders: DataFrame, y0: Int, y1: Int): DataFrame =
    orders
      .where(year(col("o_orderdate")).between(y0, y1))
      .groupBy(period(col("o_orderdate")).as("m"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("tot"))
      .where(col("tot") > 0)
      .groupBy(substring(col("m"), 6, 2).as("mm"))
      .agg((sum(col("tot")).cast(DoubleType) / count(lit(1))).as("avg_rev"),
           count(lit(1)).as("n_years"))
      .orderBy("mm")

  /** Top-N + "OUTROS" bucket (A9/A10,
    * social/bdqueimadas_daily/pipeline.py:420-430,
    * social/anp_producao/pipeline.py:328-344): rank groups, relabel the
    * tail, re-aggregate. Deterministic tiebreak (cnt desc, name asc). */
  def topNOther(customer: DataFrame, nation: DataFrame, n: Int): DataFrame = {
    val per = customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"),
           sum(col("c_acctbal").cast(DecimalType(18, 2))).as("bal"))
    val ranked = per.withColumn(
      "rn", row_number().over(Window.orderBy(col("cnt").desc, col("n_name").asc)))
    ranked
      .withColumn("label", when(col("rn") <= n, col("n_name")).otherwise(lit("OUTROS")))
      .groupBy("label")
      .agg(sum("cnt").as("cnt"), sum("bal").cast(DoubleType).as("bal"))
      .orderBy("label")
  }

  /** Share-of-total within a partition (A11,
    * social/anp_producao/pipeline.py:347-366): nation balance over region
    * total × 100, one window over the aggregated frame. */
  def shareOfTotal(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val per = customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("c_acctbal").cast(DecimalType(18, 2))).as("bal"))
    per.select(
        col("r_name"), col("n_name"),
        col("bal").cast(DoubleType).as("bal"),
        (col("bal").cast(DoubleType) /
          sum(col("bal")).over(Window.partitionBy("r_name")).cast(DoubleType) * 100)
          .as("share_pct"))
      .orderBy("r_name", "n_name")
  }

  /** Multi-key sort + head (O1, bdqueimadas_overview.py:952-955): top-k
    * nations by (cnt desc, bal desc, name asc) — unique final key makes the
    * limit deterministic. */
  def multisortTopk(customer: DataFrame, nation: DataFrame, k: Int): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"), dsum(col("c_acctbal")).as("bal"))
      .orderBy(col("cnt").desc, col("bal").desc, col("n_name").asc)
      .limit(k)

  /** Argmax row per group (A12, social/bdqueimadas_daily/pipeline.py:545-549)
    * — top user by total value per event type; row_number (not max_by) for a
    * deterministic tiebreak. */
  def argmaxUser(events: DataFrame): DataFrame = {
    val per = events.groupBy("event_type", "user_id")
      .agg(sum(col("value").cast(DecimalType(18, 2))).as("tot"))
    per.withColumn(
        "rn", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(col("tot").desc, col("user_id").asc)))
      .where(col("rn") === 1)
      .select(col("event_type"), col("user_id"), col("tot").cast(DoubleType).as("total"))
      .orderBy("event_type")
  }

  /** Per-key change detection via lag (freshness/storage.py:96-151):
    * interval to the previous observation of the same key. Timestamps are
    * second-truncated for engine-portable arithmetic (the parquet carries
    * nanoseconds). Partitioned by user → fully distributed. */
  def changeDetection(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val ts = unix_timestamp(date_trunc("second", col("ts"))).cast(LongType)
    events
      .select(col("event_id"), col("user_id"), ts.as("t"))
      .withColumn("prev_t", lag(col("t"), 1).over(w))
      .select(
        col("event_id"), col("user_id"),
        (col("t") - col("prev_t")).as("interval_s"),
        (col("t") - col("prev_t") > 0).as("changed"))
      .orderBy("event_id")
  }

  /** Sessionization (gaps-and-islands): events of a key belong to one
    * session while consecutive gaps stay ≤ `gapSeconds`. Session id =
    * running sum of gap-break flags — one keyed window, fully
    * distributed (Structured Streaming's `session_window` is the
    * streaming twin; this portable form is also the DuckDB oracle). */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    val t = unix_timestamp(date_trunc("second", col("ts"))).cast(LongType)
    val wOrd = Window.partitionBy("user_id").orderBy("t")
    val brk = when(col("t") - lag(col("t"), 1).over(wOrd) > gapSeconds ||
                   lag(col("t"), 1).over(wOrd).isNull, 1).otherwise(0)
    events.select(col("user_id"), t.as("t"))
      .withColumn("brk", brk)
      .withColumn("sid", sum("brk").over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("t").as("s_start"), max("t").as("s_end"),
           count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s_start"), col("s_end"), col("n_events"))
      .orderBy("user_id", "s_start")
  }

  /** Month pivot (the reference's per-month count maps,
    * bdqueimadas_overview.py:1896-1899, as a relational pivot):
    * one row per year, one column per calendar month. */
  def monthPivot(orders: DataFrame): DataFrame = {
    val base = orders.select(year(col("o_orderdate")).as("yr"),
      date_format(col("o_orderdate"), "MM").as("mm"))
    val months = (1 to 12).map(m => f"$m%02d")
    val pivoted = base.groupBy("yr").pivot("mm", months).agg(count(lit(1)))
    months.foldLeft(pivoted) { (df, m) =>
      df.withColumn(s"m$m", coalesce(col(m), lit(0L))).drop(m)
    }.orderBy("yr")
  }

  /** Cadence classification (A20, freshness/classifier.py:80-163): per key,
    * median + coefficient of variation of inter-event intervals → cadence
    * label + confidence. Moments computed from exact integer sums so the
    * doubles are reproducible bit-for-bit across engines. */
  def cadence(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val t = unix_timestamp(date_trunc("second", col("ts"))).cast(LongType)
    val iv = events
      .select(col("user_id"), col("event_id"), t.as("t"))
      .withColumn("interval_s", col("t") - lag(col("t"), 1).over(w))
      .where(col("interval_s").isNotNull && col("interval_s") > 0)
    iv.groupBy("user_id")
      .agg(
        count(lit(1)).as("n"),
        median(col("interval_s").cast(DoubleType)).as("median_s"),
        sum(col("interval_s")).as("sx"),
        sum(col("interval_s") * col("interval_s")).as("sx2"))
      .select(
        col("user_id"), col("n"), col("median_s"),
        (col("sx").cast(DoubleType) / col("n")).as("mean_s"),
        // clamp at 0: equal intervals give variance exactly 0 in theory
        // but float error can land at -1e-12 → sqrt NaN (oracle clamps too)
        sqrt(greatest(
          col("sx2").cast(DoubleType) / col("n") -
            (col("sx").cast(DoubleType) / col("n")) * (col("sx").cast(DoubleType) / col("n")),
          lit(0.0))).as("sd"))
      .select(
        col("user_id"), col("n"), col("median_s"), col("mean_s"),
        when(col("mean_s") === 0, lit(null).cast(DoubleType))
          .otherwise(col("sd") / col("mean_s")).as("cv"))
      .withColumn("cadence",
        when(col("median_s") <= 3600 * 6, "frequent")
          .when(col("median_s") <= 3600 * 36, "daily")
          .when(col("median_s") <= 86400 * 8, "weekly")
          .otherwise("irregular"))
      .withColumn("confidence",
        when(col("cv").isNull, "low")
          .when(col("cv") < 0.5, "high")
          .when(col("cv") < 1.0, "medium")
          .otherwise("low"))
      .orderBy("user_id")
  }

  /** The reference's exact cadence ladder + confidence rules
    * (freshness/classifier.py:116-135 `_cadence_for`, :138-154
    * `_confidence_for`) as column expressions over per-key aggregates
    * (observations, changes, median interval DAYS, cv, warnings count,
    * methods count). The event-scale `cadence` above is the
    * testdata-calibrated variant; this is the faithful one. */
  def referenceCadence(obs: org.apache.spark.sql.Column,
                       changes: org.apache.spark.sql.Column,
                       medianDays: org.apache.spark.sql.Column,
                       cv: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(obs >= 6 && changes < 2, "ad_hoc")
      .when(changes < 3, "insufficient_data")
      .when(cv.isNotNull && cv > 0.75, "irregular")
      .when(obs >= 30 && medianDays.isNotNull && medianDays <= 1.5, "daily")
      .when(obs >= 8 && medianDays.isNotNull &&
        medianDays.between(5, 10), "weekly")
      .when(medianDays.isNotNull && medianDays.between(25, 35), "monthly")
      .otherwise("irregular")

  def referenceConfidence(obs: org.apache.spark.sql.Column,
                          changes: org.apache.spark.sql.Column,
                          cv: org.apache.spark.sql.Column,
                          nWarnings: org.apache.spark.sql.Column,
                          nMethods: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(changes < 3 || obs < 6 || nWarnings > 0, "low")
      .when(nMethods > 1, "low")
      .when(obs >= 30 && (cv.isNull || cv <= 0.25), "high")
      .when(cv.isNull || cv <= 0.75, "medium")
      .otherwise("low")
}
