package graft

import org.apache.spark.sql.SparkSession

/** Scratch: time q173/q178 against a replica dir with the ScaleBench
  * session confs — isolates the aggregate fast-path effect at x1000
  * without the full scale harness. Test scope only. */
object DebugCdc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/ev_x1000")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("GRAFT_OHA_THRESHOLD", "65536"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = new Bench.MetricsListener
    spark.sparkContext.addSparkListener(m)
    Seq("q173_cdc_apply", "q178_mad_outliers").foreach { q =>
      (1 to 2).foreach { i =>
        m.reset()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"$q run$i wall=$sec%7.2f ${m.json()}")
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
