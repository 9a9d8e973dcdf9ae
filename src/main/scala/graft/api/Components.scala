package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.PipelineConfig
import graft.ingest.ParquetIngestor
import graft.load.Loader
import graft.model.{Schemas, StorageStats, ValidationResult}
import graft.transform.Transforms
import graft.validate.Validation

/** The reference's four-component public API (src/components/base.py:16-96,
  * traced in SURVEY §3.2), so a user of the reference can switch
  * component-for-component:
  *
  *   ingestion.execute(forceFullReload)    -> Option[DataFrame]
  *   transformation.execute(raw)           -> DataFrame
  *   validation.execute(transformed)       -> ValidationResult
  *   loading.execute(transformed, result)  -> Boolean
  *   loading.getStorageSummary()           -> StorageStats
  *   loading.queryStoredData(date, sensor) -> DataFrame
  *
  * Each wrapper delegates to the engine modules; between-component
  * frames stay LAZY (unlike the reference's eager pandas hand-offs) —
  * composing all four still builds one Catalyst plan per action.
  */
final class IngestionComponent(
    spark: SparkSession,
    rawDir: String,
    cfg: PipelineConfig = PipelineConfig.default) {

  @volatile var lastResult: Option[ParquetIngestor.Result] = None

  /** Discover + schema-validate + read new raw files (reference
    * ingestion.execute, ingestion.py:44-108). Like the reference this is
    * the EAGER entry point: the batch is counted here and the checkpoint
    * committed immediately (ingestion.py:96-98 updates after the eager
    * read). Pipeline.run instead defers the commit until after the load
    * stage succeeds — strictly safer when the stages run as one plan. */
  def execute(forceFullReload: Boolean = false): Option[DataFrame] = {
    val res = ParquetIngestor.ingest(
      spark, rawDir, Schemas.raw,
      checkpointPath = Some(s"$rawDir/${cfg.ingestion.checkpointFile}"),
      incremental = cfg.ingestion.incrementalMode && !forceFullReload)
    lastResult = Some(res)
    res.commit(res.data.map(_.count()).getOrElse(0L))
    res.data
  }
}

final class TransformationComponent(
    cfg: PipelineConfig = PipelineConfig.default) {

  /** Clean + calibrate + normalize time + derive features + flag
    * anomalies (reference transformation.execute,
    * transformation.py:42-91). Lazy: returns an unevaluated plan. */
  def execute(raw: DataFrame): DataFrame =
    raw.transform(Transforms.pipeline(cfg))
}

final class ValidationComponent(
    cfg: PipelineConfig = PipelineConfig.default) {

  /** Full data-quality suite -> ValidationResult (reference
    * validation.execute, validation.py:56-124). */
  def execute(transformed: DataFrame): ValidationResult =
    Validation.collectMetrics(cfg)(transformed)

  def writeReport(result: ValidationResult, path: String)(
      implicit spark: SparkSession): Unit =
    Validation.writeReport(result, path)
}

final class LoadingComponent(
    spark: SparkSession,
    outPath: String,
    cfg: PipelineConfig = PipelineConfig.default) {

  /** Optimize types + append metadata + partitioned write (reference
    * loading.execute, loading.py:51-97). */
  def execute(transformed: DataFrame, result: ValidationResult): Boolean = {
    val ts = java.time.Instant.now.toString
    // observe(): stored-row count rides the write job — exact even when
    // outlierHandling=remove has dropped rows since validation counted.
    val storedObs = new org.apache.spark.sql.Observation()
    val prepared = transformed
      .transform(Loader.addMetadata(result, cfg.pipelineVersion, ts))
      .transform(Loader.optimizeTypes)
      .observe(storedObs,
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("rows"))
    Loader.write(cfg, outPath)(prepared)
    val stats = Loader.storageStats(spark, outPath)
    Loader.writeMetadata(spark, outPath, result, stats,
      storedObs.get("rows").asInstanceOf[Long], ts)
    true
  }

  /** Reference loading.get_storage_summary (loading.py:374-401). */
  def getStorageSummary(): StorageStats = Loader.storageStats(spark, outPath)

  /** Reference loading.query_stored_data (loading.py:338-372) — with
    * real partition pruning instead of the reference's full read. */
  def queryStoredData(
      date: Option[String] = None,
      sensorId: Option[String] = None): DataFrame =
    Loader.readBack(spark, outPath, date, sensorId)
}
