package graft

import java.sql.Timestamp
import graft.operators.Aggregates

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def li(rows: (String, Double, Double, Double, String, String)*) =
    rows.toDF("ship", "l_quantity", "l_extendedprice", "l_discount",
              "l_returnflag", "l_linestatus")
      .selectExpr("CAST(ship AS TIMESTAMP) AS l_shipdate", "l_quantity",
                  "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")

  test("pricingSummary: exact decimal sums and counts") {
    val df = li(
      ("2024-01-05", 1.0, 10.0, 0.1, "A", "F"),
      ("2024-01-06", 2.0, 20.0, 0.0, "A", "F"),
      ("2024-02-01", 3.0, 30.0, 0.5, "B", "O"))
    val out = Aggregates.pricingSummary(df).collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getString(0) == "A" && a.getLong(2) == 2)
    assert(a.getDouble(3) == 3.0)            // sum_qty
    assert(a.getDouble(5) == 10.0 * 0.9 + 20.0) // revenue exact
    assert(a.getDouble(6) == 1.5)            // avg_qty
  }

  test("groupingSetCounts: 8 grouping sets, per-set totals consistent") {
    val df = li(
      ("2024-01-05", 1.0, 1.0, 0.0, "A", "F"),
      ("2024-01-06", 1.0, 1.0, 0.0, "A", "O"),
      ("2024-02-01", 1.0, 1.0, 0.0, "B", "F"))
    val out = Aggregates.groupingSetCounts(df)
    val rows = out.collect()
    // (yr) set: one row with everything but yr null-grouped, value 3
    val yrOnly = rows.filter(r =>
      r.getAs[Int]("g_period") == 1 && r.getAs[Int]("g_state") == 1 &&
      r.getAs[Int]("g_biome") == 1)
    assert(yrOnly.map(_.getAs[Long]("value")).sum == 3)
    // (period, yr, state, biome) set: fully grouped rows sum to 3 as well
    val full = rows.filter(r =>
      r.getAs[Int]("g_period") == 0 && r.getAs[Int]("g_state") == 0 &&
      r.getAs[Int]("g_biome") == 0)
    assert(full.map(_.getAs[Long]("value")).sum == 3)
  }

  test("sentinelUnion: __ALL__ rows equal the per-flag totals") {
    val df = li(
      ("2024-01-05", 1.0, 1.0, 0.0, "A", "F"),
      ("2024-01-06", 1.0, 1.0, 0.0, "A", "O"))
    val out = Aggregates.sentinelUnion(df).collect()
    val all = out.filter(_.getString(1) == "__ALL__")
    assert(all.length == 1 && all.head.getLong(2) == 2)
    assert(out.filter(_.getString(1) != "__ALL__").map(_.getLong(2)).sum == 2)
  }

  test("zeroFilledDays: domain days with no events get 0") {
    val ev = Seq((1L, Timestamp.valueOf("2024-01-02 10:00:00"), 1L))
      .toDF("event_id", "ts", "user_id")
    val out = Aggregates.zeroFilledDays(ev, "2024-01-01", "2024-01-03").collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getDate(0).toString, r.getLong(1))).toSeq ==
      Seq(("2024-01-01", 0L), ("2024-01-02", 1L), ("2024-01-03", 0L)))
  }

  test("typeInfer: numeric vs categorical vs string verdicts") {
    val docs = (0 until 20).map(i => (i.toLong, s"text $i", "en", "src", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Aggregates.typeInfer(docs).collect()
      .map(r => r.getString(0) -> r.getAs[String]("inferred")).toMap
    assert(out("doc_id") == "int")
    assert(out("lang") == "categorical")
    assert(out("n_chars") == "int")
  }
}
