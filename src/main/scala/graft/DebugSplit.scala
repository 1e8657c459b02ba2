package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Throwaway: find the smallest scale where split != unsplit. */
object DebugSplit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.maxPlanStringLength", "100000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.IngestFuzzy
    def td(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
    val keys = docs.selectExpr("doc_id", "substring(text, 1, 32) AS key")
    for (n <- Seq(20000L)) {
      val store = td(s"dbg_store$n")
      IngestFuzzy.fuzzySave(spark,
        keys.where(col("doc_id") < n / 2)
          .selectExpr("doc_id AS id", "key AS s"), store, 3)
      val batch = keys.where(col("doc_id") >= n / 2 && col("doc_id") < n)
      val (kU, rU, _) = IngestFuzzy.gateBatchStats(batch, store, "key", Int.MaxValue)
      val u = kU.select("doc_id").collect().map(_.getLong(0)).toSet
      rU()
      val (kS, rS, st) = IngestFuzzy.gateBatchStats(batch, store, "key", (n / 10).toInt)
      val s = kS.select("doc_id").collect().map(_.getLong(0)).toSet
      rS()
      val (kS2, rS2, st2) = IngestFuzzy.gateBatchStats(batch, store, "key", (n / 10).toInt)
      val s2 = kS2.select("doc_id").collect().map(_.getLong(0)).toSet
      rS2()
      println(s"DBG n=$n unsplit=${u.size} split=${s.size} split2=${s2.size} " +
        s"deterministic=${s == s2} onlyU=${(u -- s).size} onlyS=${(s -- u).size} " +
        s"sliceSizes=${st.map(_._1)} sliceSizes2=${st2.map(_._1)} " +
        s"exU=${(u -- s).take(5).toSeq.sorted}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }
}
