package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Freshness
import graft.streaming.Freshness.SourceObservation

class FreshnessStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("changeDetection: keyed state across micro-batches, date precision collapses") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[SourceObservation]
    val q = Freshness.changeDetection(input.toDS())
      .writeStream.format("memory").queryName("chg")
      .outputMode("append").start()

    input.addData(
      SourceObservation("w1", "r1", ts("2024-01-01 10:00:00"), ts("2024-01-01 08:00:00"), "datetime"))
    q.processAllAvailable()
    input.addData(
      // same modification time → unchanged
      SourceObservation("w1", "r1", ts("2024-01-02 10:00:00"), ts("2024-01-01 08:00:00"), "datetime"),
      // moved by 26h → changed
      SourceObservation("w1", "r1", ts("2024-01-03 10:00:00"), ts("2024-01-02 10:00:00"), "datetime"))
    q.processAllAvailable()
    input.addData(
      // date precision: same DAY as previous state (2024-01-02) → unchanged
      SourceObservation("w1", "r1", ts("2024-01-04 10:00:00"), ts("2024-01-02 23:00:00"), "date"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("chg").orderBy("observedAt").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Boolean]("changed")).toSeq ==
      Seq(false, false, true, false))
    // interval of the one change: 08:00 Jan 1 → 10:00 Jan 2 = 26 h
    assert(rows(2).getAs[Double]("intervalHours") == 26.0)
  }

  test("streamingExactDedup: first arrival per content hash wins across micro-batches") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "ts")
    val q = Freshness.streamingExactDedup(df, watermark = "1 hour")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    // batch 1: two distinct texts + one in-batch duplicate
    input.addData((0L, "alpha beta", ts("2024-01-01 10:00:00")),
      (1L, "gamma delta", ts("2024-01-01 10:01:00")),
      (2L, "alpha beta", ts("2024-01-01 10:02:00")))
    q.processAllAvailable()
    // batch 2: a cross-batch duplicate within the horizon + one new text
    input.addData((3L, "alpha beta", ts("2024-01-01 10:30:00")),
      (4L, "epsilon", ts("2024-01-01 10:31:00")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sdedup").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // doc 0 wins "alpha beta"; docs 2 and 3 are suppressed
    assert(out == Set((0L, "alpha beta"), (1L, "gamma delta"), (4L, "epsilon")))
    // batch analog (q35 exactDedup) keeps the same survivors
    val batch = graft.operators.Dedup.exactDedup(
        Seq((0L, "alpha beta"), (1L, "gamma delta"), (2L, "alpha beta"),
          (3L, "alpha beta"), (4L, "epsilon")).toDF("doc_id", "text"))
      .collect().map(_.getLong(1)).toSet
    assert(batch == out.map(_._1))
  }

  test("sessions: streaming session_window matches batch sessionize starts/counts") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "user_id")
    val q = graft.streaming.Freshness.sessions(df, gap = "30 minutes",
        watermark = "1 hour")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // user 1: two sessions (gap > 30 min between 10:40 and 12:00);
    // user 2: one session
    val events = Seq(
      (ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:20:00"), 1L),
      (ts("2024-01-01 10:40:00"), 1L), (ts("2024-01-01 12:00:00"), 1L),
      (ts("2024-01-01 11:00:00"), 2L))
    input.addData(events: _*)
    // advance the watermark far enough to close every session
    input.addData((ts("2024-01-02 00:00:00"), 99L))
    q.processAllAvailable()
    input.addData((ts("2024-01-03 00:00:00"), 99L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
      .filter(_._1 != 99L).toSet
    // batch analog over the same rows (q59 semantics)
    val batch = graft.operators.Windows.sessionize(
        events.toDF("ts2", "user_id").selectExpr("user_id",
          "cast(ts2 as timestamp) as ts", "0L as event_id", "'click' as event_type",
          "0.0 as value", "'{}' as props"), 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(streamed.map { case (u, st, n) => (u, st.getTime / 1000, n) } == batch)
  }

  test("update-mode republication: late rows revise emitted aggregates") {
    // §2.9 "republication handling": update-mode windowed agg re-emits a
    // bucket when late-but-within-watermark data lands.
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val q = graft.streaming.Freshness.dailyCounts(df, watermark = "10 days")
      .writeStream.format("memory").queryName("upd").outputMode("update").start()
    input.addData((ts("2024-01-01 05:00:00"), "click"))
    q.processAllAvailable()
    input.addData((ts("2024-01-01 06:00:00"), "click")) // late revision
    q.processAllAvailable()
    q.stop()
    val emitted = spark.table("upd").collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(2)))
    // bucket emitted twice: first count 1, revised count 2
    assert(emitted.contains(("2024-01-01", 1L)) && emitted.contains(("2024-01-01", 2L)))
  }

  test("slidingWindowCounts: event lands in overlapping 7-day windows") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val q = graft.streaming.Freshness.slidingWindowCounts(df)
      .writeStream.format("memory").queryName("slide").outputMode("append").start()
    input.addData((ts("2024-01-10 12:00:00"), "click"))
    q.processAllAvailable()
    input.addData((ts("2024-01-25 00:00:00"), "click")) // advance watermark
    q.processAllAvailable()
    q.stop()
    val starts = spark.table("slide").collect().map(_.getTimestamp(0).toString.take(10))
    // the Jan-10 event appears in 7 overlapping daily-sliding windows
    assert(starts.count(s => s >= "2024-01-04" && s <= "2024-01-10") == 7)
  }

  test("dailyCounts: watermark-closed windows only") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "event_type")
    val q = Freshness.dailyCounts(df).writeStream
      .format("memory").queryName("daily").outputMode("append").start()

    input.addData((ts("2024-01-01 05:00:00"), "click"), (ts("2024-01-01 06:00:00"), "click"))
    q.processAllAvailable()
    // advance watermark past Jan 1 + 1 day
    input.addData((ts("2024-01-03 01:00:00"), "click"))
    q.processAllAvailable()
    input.addData((ts("2024-01-05 01:00:00"), "click"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("daily").collect()
      .map(r => r.getTimestamp(0).toString.take(10) -> r.getLong(2)).toMap
    assert(rows.get("2024-01-01").contains(2L)) // closed window emitted
    assert(!rows.contains("2024-01-05"))        // open window withheld
  }
}
