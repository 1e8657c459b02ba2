package graft

import org.apache.spark.sql.functions._
import graft.core.{Layout, Tables}

class LayoutSpec extends SparkSpec {

  test("year-partitioned layout prunes scanned files") {
    val dir = java.nio.file.Files.createTempDirectory("part").toFile.getAbsolutePath
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .withColumn("year", year(col("l_shipdate")))
    Layout.writePartitioned(li, s"$dir/li", "year")

    val all = spark.read.parquet(s"$dir/li")
    val pruned = all.where(col("year") === 1998)
    val full = Layout.scannedFiles(all.where(col("l_quantity") > 0))
    val few = Layout.scannedFiles(pruned)
    assert(few < full, s"pruned=$few full=$full")
    // correctness preserved
    assert(pruned.count() ==
      Tables.lineitem(spark, "/root/testdata/sf0.001")
        .where(year(col("l_shipdate")) === 1998).count())
  }

  test("bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    // in-memory catalog: orphan warehouse dirs from previous JVMs are
    // invisible to DROP TABLE — remove them physically
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("li_b", "o_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Layout.writeBucketed(li, "li_b", "l_orderkey", 8)
    Layout.writeBucketed(o, "o_b", "l_orderkey", 8)

    val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
    // disable broadcast so the test exercises the co-location path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
      assert(!Layout.hasShuffle(j), "bucketed join should not shuffle")
      assert(j.count() == 6000)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    val unbucketed = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(Layout.hasShuffle(
      unbucketed.join(unbucketed.select(col("l_orderkey")), "l_orderkey")))
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val _ = joined
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }
}
