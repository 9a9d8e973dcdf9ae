package graft.config

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import scala.jdk.CollectionConverters._

/** Inclusive validity range for a reading type.
  * Reference: config/default.yaml:29-38, src/config/models.py:59-62. */
final case class ValueRange(min: Double, max: Double) {
  require(min <= max, s"range min $min > max $max")
  def contains(v: Double): Boolean = v >= min && v <= max
}

/** Linear calibration `value * multiplier + offset`, keyed by reading type.
  * Reference: config/default.yaml:41-47, src/config/models.py:65-68. */
final case class Calibration(multiplier: Double, offset: Double)

/** Parquet sink settings. Reference: config/default.yaml:49-54. */
final case class WriteConfig(
    compression: String = "zstd",
    partitionBy: Seq[String] = Seq("date", "sensor_id"),
    mode: String = "overwrite")

/** Transformation stage knobs. Reference: config/default.yaml:57-60. */
final case class TransformConfig(
    zScoreThreshold: Double = 3.0,
    rollingWindowDays: Int = 7,
    readingsPerDay: Int = 24,
    outlierHandling: String = "flag") {
  /** Trailing row-count frame: 7 days x 24 obs/day = 168 rows
    * (reference transformation.py:262-264 — row-count, not time-range). */
  def rollingWindowRows: Int = rollingWindowDays * readingsPerDay
}

/** Validation thresholds. Reference: config/default.yaml:62-66. */
final case class ValidationConfig(
    maxMissingPercentage: Double = 20.0,
    maxAnomalyPercentage: Double = 10.0,
    expectedFrequencyHours: Int = 1,
    maxGapHours: Double = 1.0)

/** Ingestion settings. Reference: config/default.yaml:68-70. */
final case class IngestionConfig(
    incrementalMode: Boolean = true,
    checkpointFile: String = ".checkpoint")

/** Column-name binding so every stage works over any table shaped like
  * (id, timestamp, type, value[, battery]) — the reference hard-codes
  * sensor_id/timestamp/reading_type/value/battery_level
  * (src/models/data.py:12-18). */
final case class ReadingCols(
    id: String = "sensor_id",
    ts: String = "timestamp",
    typ: String = "reading_type",
    value: String = "value",
    battery: String = "battery_level")

object ReadingCols {
  val sensor: ReadingCols = ReadingCols()
  /** Binding for the synthetic `events` table. */
  val events: ReadingCols =
    ReadingCols(id = "user_id", ts = "ts", typ = "event_type",
      value = "value", battery = "value")
}

/** Full pipeline configuration.
  * Reference: src/config/models.py:112-141 + config/default.yaml. */
final case class PipelineConfig(
    timezone: String = "UTC+05:30",
    pipelineVersion: String = "1.0.0",
    ranges: Map[String, ValueRange] = PipelineConfig.defaultRanges,
    calibration: Map[String, Calibration] = PipelineConfig.defaultCalibration,
    batteryRange: ValueRange = ValueRange(0.0, 100.0),
    write: WriteConfig = WriteConfig(),
    transformation: TransformConfig = TransformConfig(),
    validation: ValidationConfig = ValidationConfig(),
    ingestion: IngestionConfig = IngestionConfig(),
    cols: ReadingCols = ReadingCols.sensor) {

  /** "UTC+05:30" -> signed minutes east of UTC (330). Mirrors the
    * reference's offset parse (transformation.py:187-228). */
  def timezoneOffsetMinutes: Int = PipelineConfig.parseUtcOffset(timezone)
}

object PipelineConfig {

  /** Reference defaults: config/default.yaml:29-38. */
  val defaultRanges: Map[String, ValueRange] = Map(
    "temperature" -> ValueRange(-10.0, 60.0),
    "humidity" -> ValueRange(0.0, 100.0))

  /** Reference defaults: identity calibration (config/default.yaml:41-47). */
  val defaultCalibration: Map[String, Calibration] = Map(
    "temperature" -> Calibration(1.0, 0.0),
    "humidity" -> Calibration(1.0, 0.0))

  val default: PipelineConfig = PipelineConfig()

  private val offsetRe = """(?i)UTC([+-])(\d{1,2}):(\d{2})""".r

  def parseUtcOffset(tz: String): Int = tz.trim match {
    case "UTC" | "utc" => 0
    case offsetRe(sign, h, m) =>
      val v = h.toInt * 60 + m.toInt
      if (sign == "-") -v else v
    case other =>
      throw new IllegalArgumentException(s"unsupported timezone '$other'")
  }

  /** Load overrides from a JSON file (Jackson ships with Spark). Any
    * omitted section keeps its default — same spirit as the reference's
    * Pydantic defaults (src/config/models.py:112-141). */
  def fromJson(path: String): PipelineConfig = {
    val mapper = new ObjectMapper()
      .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    val root = mapper.readTree(Files.readString(Paths.get(path)))
    var cfg = default

    Option(root.get("timezone")).foreach(n => cfg = cfg.copy(timezone = n.asText))
    Option(root.get("pipeline_version")).foreach(n => cfg = cfg.copy(pipelineVersion = n.asText))
    Option(root.get("ranges")).foreach { n =>
      val m = n.asInstanceOf[ObjectNode].properties.asScala.map { e =>
        e.getKey -> ValueRange(e.getValue.get("min").asDouble, e.getValue.get("max").asDouble)
      }.toMap
      cfg = cfg.copy(ranges = m)
    }
    Option(root.get("calibration")).foreach { n =>
      val m = n.asInstanceOf[ObjectNode].properties.asScala.map { e =>
        e.getKey -> Calibration(
          e.getValue.get("multiplier").asDouble, e.getValue.get("offset").asDouble)
      }.toMap
      cfg = cfg.copy(calibration = m)
    }
    Option(root.get("write")).foreach { n =>
      var w = cfg.write
      Option(n.get("compression")).foreach(x => w = w.copy(compression = x.asText))
      Option(n.get("partition_by")).foreach(x =>
        w = w.copy(partitionBy = x.elements.asScala.map(_.asText).toSeq))
      Option(n.get("mode")).foreach(x => w = w.copy(mode = x.asText))
      cfg = cfg.copy(write = w)
    }
    Option(root.get("transformation")).foreach { n =>
      var t = cfg.transformation
      Option(n.get("z_score_threshold")).foreach(x => t = t.copy(zScoreThreshold = x.asDouble))
      Option(n.get("rolling_window_days")).foreach(x => t = t.copy(rollingWindowDays = x.asInt))
      Option(n.get("outlier_handling")).foreach(x => t = t.copy(outlierHandling = x.asText))
      cfg = cfg.copy(transformation = t)
    }
    Option(root.get("validation")).foreach { n =>
      var v = cfg.validation
      Option(n.get("max_missing_percentage")).foreach(x => v = v.copy(maxMissingPercentage = x.asDouble))
      Option(n.get("max_anomaly_percentage")).foreach(x => v = v.copy(maxAnomalyPercentage = x.asDouble))
      Option(n.get("expected_frequency_hours")).foreach(x => v = v.copy(expectedFrequencyHours = x.asInt))
      Option(n.get("max_gap_hours")).foreach(x => v = v.copy(maxGapHours = x.asDouble))
      cfg = cfg.copy(validation = v)
    }
    Option(root.get("ingestion")).foreach { n =>
      var i = cfg.ingestion
      Option(n.get("incremental_mode")).foreach(x => i = i.copy(incrementalMode = x.asBoolean))
      Option(n.get("checkpoint_file")).foreach(x => i = i.copy(checkpointFile = x.asText))
      cfg = cfg.copy(ingestion = i)
    }
    cfg
  }
}
