package graft

import org.apache.spark.sql.SparkSession

/** End-to-end drive of the full pipeline over a raw sensor directory:
  * `Test/runMain graft.PipelineDemo <rawDir> <outDir> [reportDir]`.
  * Exercises ingest (schema rejection, corrupt-file isolation,
  * checkpoint), transform, validation, partitioned load, and the
  * pruned read-back. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val rawDir = args(0)
    val outDir = args(1)
    val reportDir = if (args.length > 2) Some(args(2)) else None

    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val r1 = Pipeline.run(spark, rawDir, outDir, reportDir)
    println(s"RUN1: success=${r1.success} ingested=${r1.recordsIngested} " +
      s"stored=${r1.recordsStored} score=${r1.qualityScore} issues=${r1.issues.size}")

    val r2 = Pipeline.run(spark, rawDir, outDir, None)
    println(s"RUN2(incremental): ingested=${r2.recordsIngested}")

    val rb = graft.load.Loader.readBack(spark, outDir,
      date = Some("2023-06-01"), sensorId = Some("sensor_1"))
    println("READBACK rows=" + rb.count())
    rb.explain()
    spark.stop()
  }
}
