package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q158 triangle pipeline: forces each
  * sub-plan separately and prints wall + summed task time, so the
  * expensive stage is identified instead of guessed. Test-scope only —
  * not part of the library. */
object DebugTriangles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = new Bench.MetricsListener
    spark.sparkContext.addSparkListener(m)

    import org.apache.spark.metrics.source.CodegenMetrics
    def phase(name: String)(f: => Long): Unit = {
      m.reset()
      val cg0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val cgt0 = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      val cg = CodegenMetrics.METRIC_COMPILATION_TIME.getCount - cg0
      println(f"$name%-28s wall=$sec%7.2fs n=$n%10d cgN=$cg ${m.json()}")
    }

    (1 to 2).foreach { round =>
      println(s"=== pass $round")
      val li = queries.CoreQueries.t(spark, sfDir, "lineitem")
      val r = li.select(col("l_orderkey").as("gk"), col("l_partkey").as("m"))
      phase("selfjoin_raw") {
        r.as("a").join(r.as("b"),
          col("a.gk") === col("b.gk") && col("a.m") < col("b.m"))
          .select(col("a.m").as("u"), col("b.m").as("v")).count()
      }
      val edges = graft.operators.Graph.coOccurrenceEdges(
        li, "l_orderkey", "l_partkey").persist()
      phase("edges_distinct")(edges.count())
      val deg = edges.select(col("u").as("n"))
        .unionAll(edges.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      phase("degrees")(deg.count())
      val du = deg.select(col("n").as("u"), col("d").as("du"))
      val dv = deg.select(col("n").as("v"), col("d").as("dv"))
      val fwd = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val oriented = edges.join(du, "u").join(dv, "v")
        .select(
          when(fwd, col("u")).otherwise(col("v")).as("src"),
          when(fwd, col("v")).otherwise(col("u")).as("dst"),
          when(fwd, col("dv")).otherwise(col("du")).as("dd"))
        .persist()
      phase("orient")(oriented.count())
      val orientedB = edges.join(broadcast(du), "u").join(broadcast(dv), "v")
        .select(
          when(fwd, col("u")).otherwise(col("v")).as("src"),
          when(fwd, col("v")).otherwise(col("u")).as("dst"),
          when(fwd, col("dv")).otherwise(col("du")).as("dd"))
      phase("orient_bcast")(orientedB.count())
      if (round == 1) oriented.queryExecution.executedPlan.toString
        .linesIterator.take(30).foreach(l => println("  PLAN " + l))
      val adj = oriented.groupBy(col("src"))
        .agg(sort_array(collect_list(col("dst").cast("long"))).as("nbrs"))
        .persist()
      phase("adjacency")(adj.count())
      phase("adj_stats") {
        adj.agg(sum(size(col("nbrs")))).collect()(0).getLong(0)
      }
      val a1 = broadcast(adj.select(col("src"), col("nbrs").as("nu")))
      val a2 = broadcast(adj.select(col("src").as("dst"), col("nbrs").as("nv")))
      phase("join_only") {
        oriented.join(a1, Seq("src")).join(a2, Seq("dst"), "left")
          .select(col("src")).count()
      }
      phase("closure_native") {
        oriented.join(a1, Seq("src")).join(a2, Seq("dst"), "left")
          .select(when(col("nv").isNull, lit(0))
            .otherwise(graft.plans.SortedLongIntersectCount(col("nu"), col("nv"))).as("c"))
          .agg(sum(col("c"))).collect()(0).getLong(0)
      }
      phase("full_profile") {
        graft.operators.Graph.trianglesProfile(
          graft.operators.Graph.coOccurrenceEdges(
            li, "l_orderkey", "l_partkey")).collect()(0).getLong(3)
      }
      edges.unpersist(); oriented.unpersist(); adj.unpersist()
      graft.util.PhaseProf.drainJson()
    }
    spark.stop()
  }
}
