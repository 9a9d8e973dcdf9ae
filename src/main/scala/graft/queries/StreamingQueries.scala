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
    }))

  val oracle: Map[String, String] = Map(

    "q44_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS hour_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type""".stripMargin)
}
