package graft

import java.sql.Timestamp

import graft.config.{PipelineConfig, ReadingCols}
import graft.model.{SensorGap, TypeProfile}
import graft.validate.Validation

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private val c = ReadingCols.sensor
  private val cfg = PipelineConfig.default

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def readings(rows: (String, String, String, Double)*) =
    rows.toSeq.map { case (id, t, typ, v) => (id, ts(t), typ, v, 90.0) }
      .toDF("sensor_id", "timestamp", "reading_type", "value", "battery_level")

  test("gap detection: hourly grid anti-join counts missing hours") {
    // s1/temperature present at 10:00, 12:00 over a 10:00-14:00 span
    // -> missing 11:00, 13:00, 14:00
    val df = readings(
      ("s1", "2023-06-01 10:00:00", "temperature", 1.0),
      ("s1", "2023-06-01 12:00:00", "temperature", 1.0),
      ("s1", "2023-06-01 14:00:00", "temperature", 1.0))
    val gaps = Validation.gapReport(1, c)(df).collect()
    assert(gaps.length === 1)
    assert(gaps.head.getLong(2) === 2) // 11:00 and 13:00
  }

  test("gap detection: per-pair grid (two sensors, disjoint hours)") {
    val df = readings(
      ("s1", "2023-06-01 10:00:00", "temperature", 1.0),
      ("s2", "2023-06-01 12:00:00", "temperature", 1.0))
    // span 10:00-12:00, grid 3 hours x 2 pairs; s1 missing 11,12; s2 missing 10,11
    val gaps = Validation.gapReport(1, c)(df)
      .orderBy("sensor_id").collect()
    assert(gaps.map(r => (r.getString(0), r.getLong(2))).toSeq ===
      Seq(("s1", 2L), ("s2", 2L)))
  }

  test("gap detection: gapReport plan materializes no grid and no explode") {
    val df = readings(
      ("s1", "2023-06-01 10:00:00", "temperature", 1.0),
      ("s1", "2023-06-01 14:00:00", "temperature", 1.0))
    val plan = Validation.gapReport(1, c)(df)
      .queryExecution.optimizedPlan.toString.toLowerCase
    // the aggregate path works on gap RANGES only: the hour-grid
    // generator (sequence + explode of pairs x hours — trillions of
    // rows at 100 TB) must never appear. The one explode present has
    // constant fan-out (<= 3 candidate ranges per observed row).
    assert(!plan.contains("sequence("), plan)
  }

  test("quality score: penalties capped, floor at zero") {
    val noIssues = Validation.qualityScore(Nil, Nil, 0, cfg)
    assert(noIssues === 100.0)
    val missing = Seq(TypeProfile("t", 100, 50, 50.0)) // capped at 20
    val anomalies = Seq(TypeProfile("t", 100, 50, 50.0)) // capped at 10
    val scored = Validation.qualityScore(missing, anomalies, 100, cfg)
    // 100 - 20 - 10 - min(200,30) = 40
    assert(scored === 40.0)
    val floor = Validation.qualityScore(
      Seq.fill(5)(TypeProfile("t", 100, 100, 100.0)),
      Seq.fill(5)(TypeProfile("t", 100, 100, 100.0)), 1000, cfg)
    assert(floor === 0.0)
  }

  test("threshold assessment flags only above-threshold profiles") {
    val missing = Seq(
      TypeProfile("ok", 100, 10, 10.0),
      TypeProfile("bad", 100, 30, 30.0))
    val anomalies = Seq(TypeProfile("worse", 100, 20, 20.0))
    val gaps = Seq(SensorGap("s1", "t", 5,
      ts("2023-06-01 00:00:00"), ts("2023-06-01 05:00:00")))
    val issues = Validation.assess(missing, anomalies, gaps, cfg)
    assert(issues.length === 3)
    assert(issues.exists(_.contains("bad")))
    assert(issues.exists(_.contains("worse")))
    assert(issues.exists(_.contains("s1/t")))
  }

  test("collectMetrics assembles a full ValidationResult") {
    val df = readings(
      ("s1", "2023-06-01 10:00:00", "temperature", 25.0),
      ("s1", "2023-06-01 11:00:00", "temperature", 26.0),
      ("s2", "2023-06-01 10:00:00", "humidity", 60.0))
      .withColumn("anomalous_reading", org.apache.spark.sql.functions.lit(false))
    val res = Validation.collectMetrics(cfg)(df)
    assert(res.totalRecords === 3)
    val m = res.metrics.get
    assert(m.distinctSensors === 2)
    assert(m.missingProfile.map(_.readingType).toSet === Set("temperature", "humidity"))
    assert(m.anomalyProfile.forall(_.affected === 0))
    // s2/humidity missing at 11:00 -> 1 gap hour
    assert(m.totalMissingHours === 1)
    assert(res.qualityScore === 100.0 - 2.0) // one gap hour -> penalty 2
  }

  test("report rows cover all categories") {
    val df = readings(("s1", "2023-06-01 10:00:00", "temperature", 25.0))
      .withColumn("anomalous_reading", org.apache.spark.sql.functions.lit(false))
    val res = Validation.collectMetrics(cfg)(df)
    val cats = Validation.reportRows(res)(spark)
      .select("category").distinct().as[String].collect().toSet
    assert(Set("overall", "missing_values", "anomalies",
      "sensor_coverage").subsetOf(cats))
  }
}
