package graft

import java.sql.Timestamp

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofLeft: matches latest right at-or-before, ties by max tie-break") {
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")), // after r2
      (101L, 1L, ts("2024-01-01 08:00:00")), // exactly at r1 -> inclusive
      (102L, 1L, ts("2024-01-01 07:00:00")), // before everything -> null
      (103L, 2L, ts("2024-01-01 12:00:00"))) // other key
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 08:00:00"), 10L, 1.0),
      (1L, ts("2024-01-01 08:00:00"), 11L, 2.0), // same instant, higher id wins
      (1L, ts("2024-01-01 09:00:00"), 12L, 3.0),
      (2L, ts("2024-01-01 11:00:00"), 20L, 4.0))
      .toDF("user_id", "ts", "event_id", "value")

    val out = AsOf.asofLeft(left, right, "user_id", "ts", "event_id")
      .select($"event_id", $"asof_match.event_id".as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(out(100L) === Some(12L)) // latest before 10:00
    assert(out(101L) === Some(11L)) // tie at 08:00 -> max event_id
    assert(out(102L) === None) // nothing at-or-before
    assert(out(103L) === Some(20L))
  }
}
