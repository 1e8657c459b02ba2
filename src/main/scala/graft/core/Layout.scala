package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout utilities (SURVEY.md §4 guidance: partition focos
  * data by year so Catalyst partition-prunes the recent-N selection;
  * bucket by the hot join/grouping key so co-located joins skip the
  * shuffle entirely).
  *
  * At 100 TB these two choices dominate: a year-partitioned landing
  * layout turns the reference's "recent-N files by filename-year" into
  * metadata-only pruning, and bucketing the fact tables by join key
  * turns every fact-fact equi-join into a zero-shuffle zip of buckets.
  */
object Layout {

  /** Write `df` partitioned by the given columns (hive-style dirs);
    * queries filtering on them prune at planning time. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Register `df` as a bucketed+sorted managed table: equi-joins and
    * aggregations on `key` between tables bucketed the same way require
    * no exchange. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** The session's shuffle width — the ONE home for its resolution
    * (Stores.writeLayout and every pin derive from here). */
  def sessionWidth(df: DataFrame): Int =
    df.sparkSession.conf.getOption("spark.sql.shuffle.partitions")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(200)

  /** Repartition by `cols` at the session's FULL shuffle width,
    * pinned: AQE coalesces shuffles on their INPUT bytes and is blind
    * to downstream fan-out (a blocked candidate join whose output is
    * orders of magnitude above its input, a fused verify whose per-row
    * CPU dwarfs its bytes) — measured n=1-task stages carrying 2–3 s
    * of edit-join verify at sf0.1. An explicit partition count is
    * user-specified partitioning, exempt from coalescing, and any
    * downstream operator keyed on a prefix of `cols` reuses the one
    * exchange. Use where a byte-light frame feeds compute-dense work;
    * leave byte-proportional stages to AQE. */
  def pinWidth(df: DataFrame,
               cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(sessionWidth(df), cols: _*)

  /** True when the executed plan contains a shuffle exchange — the
    * assertion hook for co-location tests. Forces execution first so
    * AQE's final plan (where exchanges become ShuffleQueryStage leaves)
    * is what gets inspected. */
  def hasShuffle(df: DataFrame): Boolean = {
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
    }.nonEmpty
  }

  /** Number of files the scan will actually read — partition-pruning
    * assertion hook. */
  def scannedFiles(df: DataFrame): Long =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.totalNumberOfFiles
    }.sum
}
