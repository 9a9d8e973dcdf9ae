package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import graft.streaming.Streaming

/** Guards the timestamp-type boundary against testdata regeneration.
  *
  * Round 8 shipped red because the driver regenerated events.parquet
  * from TIMESTAMP(NANOS) to tz-naive TIMESTAMP(MICROS) and both the
  * batch loader and the stream schema assumed the old physical type.
  * This spec writes events-shaped fixtures in BOTH conventions the
  * data has shipped in — raw INT64 (the nanosAsLong surface of NANOS)
  * and TIMESTAMP_NTZ micros — and asserts the batch loader and the
  * streaming reader normalize each to identical TimestampType instants.
  */
class TimestampRobustnessSpec extends SparkSpec {
  import spark.implicits._

  // Two events in distinct hours; instants chosen off-hour to catch
  // unit mistakes (a 1000x collapse lands both in one 1970 window).
  private val baseUs = 1704067200L * 1000000L + 1234567L // 2024-01-01 00:00:01.234567
  private val rows = Seq(
    (1L, baseUs, 10L, "click", 1.0, "{}"),
    (2L, baseUs + 3600L * 1000000L, 11L, "view", 2.0, "{}"))

  private def writeFixture(asNanosLongs: Boolean): String = {
    val dir = Files.createTempDirectory("graft-tsfix").toString
    val df = rows
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        if (asNanosLongs) $"ts" * 1000L // raw INT64 read back as LongType
        else timestamp_micros($"ts").cast(TimestampNTZType))
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  private def expectedInstants: Set[Long] = rows.map(_._2).toSet

  private def batchInstants(dir: String): (Set[Long], Any) = {
    val df = queries.CoreQueries.t(spark, dir, "events")
    (df.select(unix_micros($"ts")).as[Long].collect().toSet,
      df.schema("ts").dataType)
  }

  test("batch loader normalizes TIMESTAMP_NTZ micros to TimestampType, same instants") {
    val dir = Files.createTempDirectory("graft-tsntz").toString
    // CoreQueries.t expects <dir>/events.parquet
    val fix = writeFixture(asNanosLongs = false)
    Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(fix))
    val (instants, tpe) = batchInstants(dir)
    assert(tpe === TimestampType)
    assert(instants === expectedInstants)
  }

  test("batch loader converts nanos-longs to TimestampType, same instants") {
    val dir = Files.createTempDirectory("graft-tsns").toString
    val fix = writeFixture(asNanosLongs = true)
    Files.createSymbolicLink(
      java.nio.file.Paths.get(dir, "events.parquet"),
      java.nio.file.Paths.get(fix))
    val (instants, tpe) = batchInstants(dir)
    assert(tpe === TimestampType)
    assert(instants === expectedInstants)
  }

  private def streamHourly(dir: String): DataFrame =
    Streaming.runToCompletion(
      spark, Streaming.hourlyAgg(Streaming.eventsStream(spark, dir)),
      s"ts_robust_${dir.hashCode.abs}")

  test("streaming reader handles both ts conventions identically") {
    val ntz = streamHourly(writeFixture(asNanosLongs = false))
      .orderBy("hour_start", "event_type").collect().toSeq
    val ns = streamHourly(writeFixture(asNanosLongs = true))
      .orderBy("hour_start", "event_type").collect().toSeq
    assert(ntz === ns)
    assert(ntz.size === 2) // one window per hour — not collapsed into 1970
    assert(ntz.map(_.getString(0)).forall(_.startsWith("2024-01-01")))
  }
}
