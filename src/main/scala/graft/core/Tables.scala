package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided TPC-H-ish testdata (TESTDATA.md).
  *
  * Every operator in the engine is a pure `DataFrame => DataFrame`
  * function; these loaders are the only place paths appear. At cluster
  * scale the same functions run over partitioned tables — the loaders
  * would point at `.../year=YYYY/` layouts so Catalyst partition-prunes
  * (SURVEY.md §4 "partition pruning analog").
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** The events parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * so `ts` arrives as a nanosecond long. Reconstruct a second-truncated
    * TimestampType column (exact integer `div` — no double round-trip,
    * ns epochs exceed 2^53). Second truncation is also what keeps event
    * arithmetic engine-portable (DuckDB keeps full ns). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_seconds(expr("ts div 1000000000")))
    else raw.withColumn("ts", date_trunc("second", col("ts")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
