package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.Streaming

class MultimodalStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal: binary payload plumbing and deterministic features") {
    val df = Seq((1L, "hello world"), (2L, "")).toDF("id", "payload")
    val media = Multimodal.asMediaTable(df, "id", "payload")
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).byte_len === 11)
    assert(feats(1L).header_byte === 'h'.toInt)
    assert(feats(2L).byte_len === 0)
    assert(feats(2L).header_byte === -1)
    // determinism across repartitionings
    val feats2 = Multimodal.extractFeatures(
      media.repartition(7)).collect().map(f => f.media_id -> f.checksum).toMap
    assert(feats2(1L) === feats(1L).checksum)
  }

  test("multimodal: frame sampling yields every stride-th chunk") {
    val payload = ("x" * 640)
    val df = Seq((1L, payload)).toDF("id", "payload")
    val media = Multimodal.asMediaTable(df, "id", "payload", kind = "video")
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 4)
      .orderBy("frame_no").collect()
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 4, 8)) // 10 chunks, stride 4
    assert(frames.forall(_.getInt(2) === 64))
  }

  test("streaming: hourly windowed agg equals batch group-by") {
    val stream = Streaming.eventsStream(spark, "/root/testdata/sf0.001/events.parquet")
    val result = Streaming.runToCompletion(
      spark, Streaming.hourlyAgg(stream), "spec_hourly")
    val batch = graft.queries.CoreQueries.t(spark, "/root/testdata/sf0.001", "events")
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss")
        .as("hour_start"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
    val streamed = result.select($"hour_start", $"event_type", $"n_events")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("streaming: session windows bound per-user activity") {
    val stream = Streaming.eventsStream(spark, "/root/testdata/sf0.001/events.parquet")
    val sessions = Streaming.runToCompletion(
      spark, Streaming.sessionCounts(stream), "spec_sessions")
    assert(sessions.count() > 0)
    val total = sessions.agg(sum("n_events")).head.getLong(0)
    assert(total === 1000L) // every event lands in exactly one session
  }
}
