package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, Normalize, StripAccents}

class StripAccentsExprSpec extends SparkSpec {

  test("dot_product registered for SQL, float arrays implicitly cast") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT strip_accents('ação é ótima') AS s, " +
        "dot_product(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d")
      .collect().head
    assert(r.getString(0) == "acao e otima")
    assert(math.abs(r.getDouble(1) - 32.0) < 1e-9)
  }
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
