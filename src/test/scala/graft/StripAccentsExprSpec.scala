package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, Normalize, StripAccents}

class StripAccentsExprSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the UDF on accents, ascii, null") {
    val df = Seq(Some("Amazônia"), Some("plain ascii"), Some("São Paulo é"), None)
      .toDF("s")
    val rows = df.select(
      StripAccents($"s").as("native"),
      Normalize.stripAccents($"s").as("udf")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getString(0) == r.getString(1))
    }
  }

  test("registered SQL function works and survives codegen") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT strip_accents(s) FROM VALUES ('Pará'), ('açúcar ê') AS t(s)")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("Para", "acucar e"))
    // inside a larger expression tree (stays codegen'd, no UDF barrier)
    val df = Seq(("Rondônia", 2)).toDF("estado", "n")
    val r = df.select(upper(StripAccents(lower($"estado"))).as("k"), ($"n" * 2).as("m"))
      .collect().head
    assert(r.getString(0) == "RONDONIA" && r.getInt(1) == 4)
  }
}
