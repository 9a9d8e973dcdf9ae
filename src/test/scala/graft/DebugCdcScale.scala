package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for iterating on the cdc_apply x1000 shape —
  * not a test; run via `Test/runMain graft.DebugCdcScale`. */
object DebugCdcScale {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("CDC_DIR", "/tmp/graft_scale/ev_x1000")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new Bench.MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    import graft.queries.CoreQueries.t
    import org.apache.spark.sql.Column
    def h32(e: Column): Column =
      conv(substring(md5(e), 1, 8), 16, 10).cast("long")

    def log(dirPath: String) = t(spark, dirPath, "events").select(
      col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"),
      col("value"),
      (h32(col("event_id").cast("string")) % 10 === 0).as("is_delete"))

    def aggOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("user_id"), col("event_type"))
        .agg(
          graft.plans.ArgMaxPackedAgg.argMaxPacked(
            col("value"), col("is_delete"),
            col("ts_us"), col("event_id")).as("last"),
          count(lit(1)).as("n_changes"))
        .filter(!col("last.flag"))
        .select(col("user_id"), col("event_type"),
          col("last.value").as("final_value"), col("n_changes"))

    def logCheap(dirPath: String) = t(spark, dirPath, "events").select(
      col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"),
      col("value"),
      (col("event_id") % 10 === 0).as("is_delete"))

    val variants: Seq[(String, () => Long)] = Seq(
      "scan_floor" -> (() => log(dir).agg(count(lit(1))).collect()(0).getLong(0)),
      "md5_floor" -> (() => log(dir)
        .agg(sum(when(col("is_delete"), 1L).otherwise(0L)))
        .collect()(0).getLong(0)),
      "plain_groupby" -> (() => aggOf(log(dir)).count()),
      "repartition_keys" -> (() =>
        aggOf(log(dir).repartition(col("user_id"), col("event_type"))).count()),
      "cheap_plain" -> (() => aggOf(logCheap(dir)).count()),
      "cheap_repart" -> (() =>
        aggOf(logCheap(dir).repartition(col("user_id"), col("event_type"))).count())
    )
    // Warmup: JIT/codegen for scan + both aggregate shapes on a small
    // slice, off the clock (the cold first samples otherwise measure
    // C2 compilation storms, not the plan).
    locally {
      val w = log(dir).limit(500000)
      aggOf(w).count()
      aggOf(w.repartition(col("user_id"), col("event_type"))).count()
    }
    val sel = args.toSet
    for ((name, fn) <- variants if sel.isEmpty || sel(name); i <- 1 to 3) {
      metrics.reset()
      val t0 = System.nanoTime()
      val n = fn()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-20s run$i wall=$sec%7.2f rows=$n ${metrics.json()}")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
