package graft

import graft.operators.Windows

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  /** orders frame with one row per (date, price). */
  private def orders(rows: (String, Double)*) =
    rows.toDF("d", "o_totalprice")
      .selectExpr("CAST(d AS TIMESTAMP) AS o_orderdate", "o_totalprice",
                  "'P' AS o_orderpriority", "'O' AS o_orderstatus")

  test("rolling12: prior window null until 12 prior months exist") {
    // 24 consecutive months, value = 1.0 each
    val rows = for (y <- 2020 to 2021; m <- 1 to 12)
      yield (f"$y-$m%02d-15", 1.0)
    val out = Windows.rolling12(orders(rows: _*)).collect()
    assert(out.length == 24)
    // month 12 (index 11): r12 = 12, prior null
    assert(out(11).getDouble(2) == 12.0 && out(11).isNullAt(3))
    // month 24 (index 23): r12 = 12, prior = 12, pct = 0
    assert(out(23).getDouble(2) == 12.0 && out(23).getDouble(3) == 12.0)
    assert(out(23).getDouble(4) == 0.0)
  }

  test("momYoy: lag(1) and lag(12) with null-on-zero pct") {
    val out = Windows.momYoy(orders(
      ("2024-01-15", 100.0), ("2024-02-15", 150.0))).collect()
    assert(out(0).isNullAt(2) && out(0).isNullAt(4)) // no prev month
    assert(out(1).getDouble(2) == 100.0)
    assert(out(1).getDouble(4) == 50.0) // (150-100)/100*100
  }

  test("cadence: threshold ladder") {
    // user 1: hourly-ish events (frequent); user 2: ~10-day gaps (weekly+)
    val e1 = (0 until 5).map(i => (i.toLong, s"2024-01-01 0$i:00:00", 1L))
    val e2 = (0 until 3).map(i => (100L + i, f"2024-01-${1 + i * 5}%02d 00:00:00", 2L))
    val ev = (e1 ++ e2).toDF("event_id", "s", "user_id")
      .selectExpr("event_id", "CAST(s AS TIMESTAMP) AS ts", "user_id")
    val out = Windows.cadence(ev).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("cadence")).toMap
    assert(out(1L) == "frequent")
    assert(out(2L) == "weekly")
  }

  test("sessionize: gap splits sessions, counts exact") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:10:00"),
      (1L, "2024-01-01 11:30:00"), // 80-min gap → new session
      (2L, "2024-01-01 09:00:00"))
      .map { case (u, s) => (u, java.sql.Timestamp.valueOf(s)) }
      .toDF("user_id", "ts")
    val out = Windows.sessionize(ev, 1800L).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("monthPivot: zero-filled month columns") {
    val df = orders(("2024-01-15", 1.0), ("2024-01-20", 2.0), ("2024-03-01", 3.0))
    val out = Windows.monthPivot(df).collect().head
    assert(out.getAs[Long]("m01") == 2L)
    assert(out.getAs[Long]("m02") == 0L)
    assert(out.getAs[Long]("m03") == 1L)
  }

  test("topNOther: tail collapses into OUTROS") {
    val cust = (0 until 10).map(i => (i.toLong, i % 3, 10.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val nat = Seq((0, "N0"), (1, "N1"), (2, "N2")).toDF("n_nationkey", "n_name")
    val out = Windows.topNOther(cust, nat, 1).collect()
    assert(out.map(_.getString(0)).toSet == Set("N0", "OUTROS"))
    assert(out.map(_.getLong(1)).sum == 10)
  }

  test("shareOfTotal: shares sum to 100 per region") {
    val cust = Seq((1L, 0, 30.0), (2L, 1, 70.0)).toDF("c_custkey", "c_nationkey", "c_acctbal")
    val nat = Seq((0, "N0", 0), (1, "N1", 0)).toDF("n_nationkey", "n_name", "n_regionkey")
    val reg = Seq((0, "R0")).toDF("r_regionkey", "r_name")
    val out = Windows.shareOfTotal(cust, nat, reg).collect()
    assert(out.map(_.getDouble(3)).sum == 100.0)
    assert(out.find(_.getString(1) == "N1").get.getDouble(3) == 70.0)
  }

  test("argmaxUser: deterministic tiebreak on user_id") {
    val ev = Seq(
      (1L, "click", 5L, 10.0), (2L, "click", 3L, 10.0))
      .toDF("event_id", "event_type", "user_id", "value")
    val out = Windows.argmaxUser(ev).collect()
    assert(out.length == 1 && out.head.getLong(1) == 3L) // tie → lower user_id
  }
}
