package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming: the streaming window agg must agree with its batch
  * twin, and stateful sessionization must accumulate across batches. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Event(id, Timestamp.valueOf(t), user, typ, v)

  test("streaming tumbling window agg equals batch q_window_hourly semantics") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      ev(1, "2024-01-01 00:10:00", 1, "a", 1.0),
      ev(2, "2024-01-01 00:50:00", 1, "a", 2.0),
      ev(3, "2024-01-01 01:10:00", 2, "b", 5.0))
    val q = EventStream.tumblingCounts(mem.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("agg_out")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("agg_out").orderBy("bucket", "event_type")
      .select("event_type", "n", "sum_v").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 2L, 3.0), ("b", 1L, 5.0)))
  }

  test("sessionize accumulates per-user state across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), spark)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Update()).start()
    mem.addData(ev(1, "2024-01-01 00:00:01", 7, "a", 1.0))
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-01 00:00:02", 7, "a", 2.0))
    q.processAllAvailable(); q.stop()
    val last = spark.table("sess_out").filter(col("user_id") === 7)
      .orderBy(col("n_events").desc).as[(Long, Long, Double)].head()
    assert(last == ((7L, 2L, 3.0)), "state carries count+sum across batches")
  }
}
