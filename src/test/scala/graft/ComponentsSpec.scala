package graft

import java.nio.file.Files

import graft.api._
import graft.config.PipelineConfig

/** Drives the reference-shaped four-component API end-to-end over the
  * generated raw fixtures — the switch-from-the-reference surface. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("four-component API: ingest -> transform -> validate -> load") {
    val raw = Files.createTempDirectory("graft-comp-raw").toString
    val out = Files.createTempDirectory("graft-comp-out").toString + "/out"
    // reuse the PipelineDemo fixture rows
    Seq(
      ("s1", java.sql.Timestamp.valueOf("2023-06-01 10:00:00"), "temperature", 25.0, 90.0),
      ("s1", java.sql.Timestamp.valueOf("2023-06-01 12:00:00"), "temperature", 26.0, 91.0),
      ("s2", java.sql.Timestamp.valueOf("2023-06-01 11:00:00"), "humidity", 65.0, 80.0))
      .toDF("sensor_id", "timestamp", "reading_type", "value", "battery_level")
      .coalesce(1).write.parquet(s"$raw/2023-06-01.parquet.dir")
    // promote part file to a named .parquet file
    val fs = new org.apache.hadoop.fs.Path(raw)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$raw/2023-06-01.parquet.dir"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$raw/2023-06-01.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$raw/2023-06-01.parquet.dir"), true)

    val cfg = PipelineConfig.default
    val ingestion = new IngestionComponent(spark, raw, cfg)
    val transformation = new TransformationComponent(cfg)
    val validation = new ValidationComponent(cfg)
    val loading = new LoadingComponent(spark, out, cfg)

    val rawDf = ingestion.execute().get
    val transformed = transformation.execute(rawDf)
    val result = validation.execute(transformed)
    assert(result.totalRecords === 3)
    assert(loading.execute(transformed, result))

    val summary = loading.getStorageSummary()
    assert(summary.totalFiles > 0 && summary.partitions > 0)
    val back = loading.queryStoredData(sensorId = Some("s1"))
    assert(back.count() === 2)

    // incremental contract: second execute sees nothing new
    assert(ingestion.execute().isEmpty)
    // force full reload re-reads everything
    assert(ingestion.execute(forceFullReload = true).get.count() === 3)
  }
}
