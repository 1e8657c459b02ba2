package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed state for Freshness.changeDetection (top-level public: Spark's
  * encoder codegen instantiates it from generated code). */
case class LastSeen(lastModified: Long)

/** Structured-Streaming expression of the reference's freshness watch
  * (SURVEY.md §2.9; reference: polling loop freshness/watch.py:24-34,
  * append log + per-key change detection freshness/storage.py:85-151,
  * date-precision equality :70-77; 7-day daily window
  * social/bdqueimadas_daily/pipeline.py:353-369).
  *
  * Batch equivalents live in operators.Windows (lag-based change
  * detection, cadence classifier); this module is the streaming runtime:
  * an unbounded observation source → keyed state → append sink. State is
  * one timestamp per (watchId, resourceKey) — bounded by the number of
  * watched resources, so it scales to any observation volume.
  */
object Freshness {

  /** One poll of one watched resource (subset of the reference's
    * 17-field observation, freshness/models.py:103-121). */
  case class SourceObservation(
      watchId: String, resourceKey: String,
      observedAt: Timestamp, sourceModifiedAt: Timestamp,
      precision: String) // "date" | "datetime"

  case class FreshnessChange(
      watchId: String, resourceKey: String,
      observedAt: Timestamp, sourceModifiedAt: Timestamp,
      changed: Boolean, previousSourceModifiedAt: Option[Timestamp],
      intervalHours: Option[Double])

  private val DayMs = 86400000L

  /** Collapse to day precision when the signal only carries a date
    * (freshness/storage.py:70-77). */
  private def effective(ms: Long, precision: String): Long =
    if (precision == "date") ms - Math.floorMod(ms, DayMs) else ms

  /** Stateful per-key change detection: emits one change record per
    * observation, holding the last-seen modification time in keyed state
    * (flatMapGroupsWithState; batch analog = lag() over the key window). */
  def changeDetection(obs: Dataset[SourceObservation]): Dataset[FreshnessChange] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(o => (o.watchId, o.resourceKey))
      .flatMapGroupsWithState[LastSeen, FreshnessChange](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((watchId, resourceKey), it, state: GroupState[LastSeen]) =>
          val sorted = it.toSeq.sortBy(_.observedAt.getTime)
          var last = state.getOption.map(_.lastModified) // raw ms
          val out = sorted.map { o =>
            val cur = o.sourceModifiedAt.getTime
            val prev = last
            // the observation's precision applies to BOTH sides: a
            // date-precision signal moving within the same day is not a
            // change (freshness/storage.py:70-77)
            val changed = prev.exists(p =>
              effective(cur, o.precision) != effective(p, o.precision))
            val interval = prev.filter(_ => changed).map(p =>
              (effective(cur, o.precision) - effective(p, o.precision)).toDouble / 3600000.0)
            last = Some(cur)
            FreshnessChange(watchId, resourceKey, o.observedAt,
              o.sourceModifiedAt, changed, prev.map(new Timestamp(_)), interval)
          }
          state.update(LastSeen(last.get))
          out.iterator
      }
  }

  /** Event-time daily counts with a watermark completeness gate: only
    * windows the watermark has closed are emitted (append mode) — the
    * streaming analog of the reference's "exclude today, it is
    * incomplete" rule (daily/pipeline.py:353-369). */
  def dailyCounts(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("day"), col("event_type"), col("cnt"))

  /** Event-time sessionization on an unbounded stream — the streaming
    * form of the batch gaps-and-islands operator (Windows.sessionize,
    * q59): Spark's native session_window merges events within `gap` per
    * key and the watermark closes sessions, so state is bounded by open
    * sessions, not history. Session end is last-event + gap (the
    * session_window contract); the batch operator reports last-event —
    * starts and counts are identical. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("s_start"),
        col("w.end").as("s_end"), col("n_events"))

  /** Streaming exact dedup — the LLM-ingest dedup gate applied to an
    * unbounded document feed: the FIRST arrival of each content hash
    * passes, later copies drop. `dropDuplicatesWithinWatermark` keys
    * state on the hash and reclaims it once the watermark passes, so
    * state is bounded by the dedup horizon (a copy arriving later than
    * the horizon re-emits — the standard bounded-state trade, sized by
    * the window). Batch analog = Dedup.exactDedup keep-first (q35);
    * equivalence within the horizon pinned by FreshnessStreamSpec.
    * Input columns: doc_id, text, ts (event time). */
  def streamingExactDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** The reference's 7-day sliding file window as an event-time stream
    * (P12, daily/pipeline.py:353-369): one row per (7-day window sliding
    * daily, key), closed by the watermark. */
  def slidingWindowCounts(events: DataFrame, width: String = "7 days",
                          slide: String = "1 day",
                          watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("cnt"))
}
