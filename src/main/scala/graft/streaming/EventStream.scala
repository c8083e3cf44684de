package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (north star; the reference is batch-only —
  * SURVEY.md §2.10 records the absence). The events table is the streaming
  * twin of the batch `q_window_hourly` plan: same logical aggregation,
  * incremental execution with watermarked state.
  */
object EventStream {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(nEvents: Long, sumValue: Double, firstTs: Long, lastTs: Long)

  case class UserSession(user_id: Long, n_events: Long, sum_value: Double,
                         session_start: java.sql.Timestamp,
                         session_end: java.sql.Timestamp)

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * state: identical semantics to the batch q_window_hourly query, so the
    * two paths are mutually verifying. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_v"))

  /** Gap-based sessionization with BOUNDED state: a per-user session is
    * (count, sum, start, end); it closes — emitted once, state removed —
    * when event time moves `gapMs` past its last event. Two close paths:
    *  - a new event for the key arriving beyond the gap closes the old
    *    session inline (no need to wait for the watermark) and opens a
    *    fresh one;
    *  - the event-time timeout fires once the watermark passes
    *    `lastTs + gapMs`, closing idle sessions and EVICTING their state —
    *    this is what keeps state finite at 100 TB/day: live state is only
    *    the users active within the last watermark+gap horizon.
    * flatMapGroupsWithState(Append, EventTimeTimeout) is the Spark-native
    * home for the reference's "accumulate rows per key" imperative loops. */
  def sessionize(events: Dataset[Event], spark: SparkSession,
                 gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "10 minutes"): Dataset[UserSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          def close(s: SessionState) = UserSession(userId, s.nEvents, s.sumValue,
            new java.sql.Timestamp(s.firstTs), new java.sql.Timestamp(s.lastTs))
          if (state.hasTimedOut) {
            val closed = close(state.get)
            state.remove()
            Iterator.single(closed)
          } else {
            // Fold the batch's events through the gap rule IN EVENT-TIME
            // ORDER: a micro-batch can carry several gap-separated runs
            // (backfill, bursty file sources), and each must close its own
            // session exactly as the batch twin (Analytics.sessionizeBatch)
            // would — not be merged because it shared a trigger.
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption.orNull
            val emitted = Seq.newBuilder[UserSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open = open match {
                case null => SessionState(1L, e.value, t, t)
                case p if t - p.lastTs > gapMs =>
                  emitted += close(p)
                  SessionState(1L, e.value, t, t)
                case p =>
                  SessionState(p.nEvents + 1, p.sumValue + e.value,
                    math.min(p.firstTs, t), math.max(p.lastTs, t))
              }
            }
            state.update(open)
            // Timeout = session end + gap, clamped above the current
            // watermark (Spark rejects timeouts at or below it, which a
            // late straggler batch could otherwise produce).
            state.setTimeoutTimestamp(
              math.max(open.lastTs + gapMs, state.getCurrentWatermarkMs() + 1))
            emitted.result().iterator
          }
      }
  }

  /** Streaming exact dedup: the streaming twin of `ext.Dedup.exactByKey` /
    * the upsert sink's within-batch dedup. State is bounded by the
    * watermark — a duplicate arriving later than `watermark` after the
    * original is NOT suppressed (that is the contract that makes state
    * finite at 100 TB/day; the batch anti-join sweep catches stragglers). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Watermarked stream-stream interval join: attach to each purchase the
    * same user's most-recent-window signup value — the streaming analogue
    * of the batch backward as-of join (Analytics.asOfJoinBackward), with
    * the unbounded "latest ever" lookback replaced by a bounded interval
    * so both join-state stores can evict by watermark. */
  def intervalJoin(purchases: DataFrame, signups: DataFrame,
                   lookback: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    val l = purchases.withWatermark("ts", watermark)
      .select(col("event_id"), col("user_id").as("l_user"), col("ts").as("l_ts"))
    val r = signups.withWatermark("ts", watermark)
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"), col("value").as("sig_val"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") <= col("l_ts") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $lookback"))
      .select(col("event_id"), col("l_user").as("user_id"),
        col("l_ts").as("ts"), col("sig_val"))
  }

  /** File-source streaming read of an events directory with the testdata
    * schema — readStream → transforms → writeStream wiring. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
}
