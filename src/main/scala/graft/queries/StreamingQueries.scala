package graft.queries

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.Streaming

/** Streaming-semantics queries, verified against batch SQL: a windowed
  * streaming aggregation over a static directory must equal the plain
  * GROUP BY over the same data (exactly-once, complete mode). */
object StreamingQueries {

  private val runId = new AtomicLong()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hourly tumbling-window streaming aggregation == batch GROUP BY.
    "q44_stream_hourly" -> ((s, dir) => {
      val stream = Streaming.eventsStream(s, s"$dir/events.parquet")
      val agg = Streaming.hourlyAgg(stream)
      Streaming.runToCompletion(s, agg,
        s"stream_hourly_${runId.incrementAndGet()}")
    }),

    // Streaming session windows == batch gap-based sessionization: the
    // engine-merged session_window (30 min gap, per user) must produce
    // exactly the sessions a lag()-based batch pass derives. Boundary
    // semantics: a session's end is last_ts + gap EXCLUSIVE, so an event
    // arriving exactly at the boundary opens a new session (mirrored in
    // the oracle's >= comparison on integer microseconds).
    "q141_stream_sessions" -> ((s, dir) => {
      val stream = Streaming.eventsStream(s, s"$dir/events.parquet")
      val agg = Streaming.sessionCounts(stream)
      Streaming.runToCompletion(s, agg,
        s"stream_sessions_${runId.incrementAndGet()}")
    }))

  val oracle: Map[String, String] = Map(

    "q44_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS hour_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type""".stripMargin,

    "q141_stream_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  user_id, count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin)
}
