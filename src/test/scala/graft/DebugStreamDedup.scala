package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness: where does stream_dedup's x1000 GC come from —
  * the stateful operator or the memory-sink drain? Runs the same
  * dedup pipeline through (a) the oracle harness (memory sink +
  * localCheckpoint), (b) foreachBatch -> noop (distributed, no driver
  * materialization), (c) foreachBatch -> parquet on tmpfs.
  * Not a test; run via `Test/runMain graft.DebugStreamDedup`. */
object DebugStreamDedup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SD_DIR", "/tmp/graft_scale/ev_x1000")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = new Bench.MetricsListener
    spark.sparkContext.addSparkListener(metrics)
    import graft.streaming.Streaming

    def dedup() = Streaming
      .eventsStream(spark, s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"), col("ts"))
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))

    def viaMemory(): Long = {
      val n = Streaming.runToCompletion(spark, dedup(),
        s"dbg_dedup_${System.nanoTime()}", outputMode = "append").count()
      println("  phase " + Streaming.lastPhaseTimings().getOrElse(""))
      n
    }
    def viaForeachBatch(sink: String): Long = {
      val ckpt = Streaming.scratchDir("dbg-sd-ckpt")
      val out = Streaming.scratchDir("dbg-sd-out")
      val acc = spark.sparkContext.longAccumulator("n")
      val q = dedup().writeStream
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          sink match {
            case "noop" =>
              b.write.mode("overwrite").format("noop").save()
            case "parquet" =>
              b.write.mode("append").parquet(out.toString)
          }
          acc.add(0)
        }
        .start()
      q.awaitTermination()
      val n =
        if (sink == "parquet") spark.read.parquet(out.toString).count() else 0L
      Streaming.deleteRecursively(ckpt); Streaming.deleteRecursively(out)
      n
    }

    val variants: Seq[(String, () => Long)] = Seq(
      "memory_sink" -> (() => viaMemory()),
      "feb_noop" -> (() => viaForeachBatch("noop")),
      "feb_parquet" -> (() => viaForeachBatch("parquet")))
    val sel = args.toSet
    for ((name, fn) <- variants if sel.isEmpty || sel(name); i <- 1 to 2) {
      metrics.reset()
      val t0 = System.nanoTime()
      val n = fn()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-14s run$i wall=$sec%7.2f rows=$n ${metrics.json()}")
      spark.streams.resetTerminated()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      org.apache.spark.sql.GraftColumnBridge.unloadStateStores()
      System.gc()
    }
    spark.stop()
  }
}
