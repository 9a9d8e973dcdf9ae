package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.text

/** Scratch profiler for the duplicated-span family's stages (r19 opt
  * round) — times each pipeline stage of q211's shape in isolation
  * through the noop sink. Not a test; run via Test/runMain. */
object DebugSpanProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val n = 5
    val ml = new Bench.MetricsListener
    spark.sparkContext.addSparkListener(ml)
    def time(name: String)(f: => Unit): Unit = {
      // warm once, measure twice
      f
      val runs = (1 to 2).map { _ =>
        ml.reset()
        val t0 = System.nanoTime(); f
        val s = (System.nanoTime() - t0) / 1e9
        (s, ml.json())
      }
      println(f"STAGE $name%-28s ${runs.map(_._1).min}%8.3f s  " +
        s"runs=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
      runs.foreach(r => println(s"    ${r._2}"))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = queries.CoreQueries.spread(
      queries.CoreQueries.t(spark, dir, "documents"))
    val staged = docs
      .select(col("doc_id"), text.tokens(col("text")).as("__t"))
      .filter(size(col("__t")) >= n)

    time("tokenize-only")(noop(staged))
    val gramHashes = transform(
      sequence(lit(0), size(col("__t")) - n),
      k => md5(concat_ws(" ", slice(col("__t"), k + 1, lit(n)))))
    time("md5-shingles-HOF")(noop(staged.select(col("doc_id"),
      gramHashes.as("__g"))))
    val fastHashes = graft.plans.WordShingleHash64(col("__t"), n)
    time("xx-shingles-native")(noop(staged.select(col("doc_id"),
      fastHashes.as("__g"))))
    time("md5-posexplode")(noop(staged.select(col("doc_id"),
      posexplode(gramHashes).as(Seq("pos", "__h")))))
    val grams = staged.select(col("doc_id"),
      posexplode(gramHashes).as(Seq("pos", "__h")))
      .repartition(32, col("__h"))
    time("grams+agg-minmax")(noop(
      grams.groupBy(col("__h"))
        .agg(min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
        .filter(col("__mn") =!= col("__mx")).drop("__mn", "__mx")))
    (1 to 4).foreach { i =>
      val q = operators.Curation.duplicatedSpans(docs, "doc_id", "text",
        n = 5, minDf = 2)
      ml.reset()
      val t0 = System.nanoTime(); noop(q)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"RUN$i q211-full $s%8.3f s ${ml.json()}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"/tmp/q211_plan_$i.txt"),
        q.queryExecution.executedPlan.toString.getBytes)
    }

    // q211 sub-chains with the operator's real partitioning
    val nWindows = staged
      .agg(coalesce(sum((size(col("__t")) - (n - 1)).cast(LongType)), lit(0L)))
      .head.getLong(0)
    println(s"nWindows=$nWindows")
    val gramsOM = operators.OutputMass.repartitionByOutputMass(
      staged.select(col("doc_id"), posexplode(gramHashes).as(Seq("pos", "__h"))),
      nWindows, bytesPerRow = 96L, col("__h"))
    println(s"gramsOM partitions=${gramsOM.rdd.getNumPartitions}")
    val dupHashes = gramsOM.groupBy(col("__h"))
      .agg(min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
      .filter(col("__mn") =!= col("__mx")).drop("__mn", "__mx")
    time("dup-join")(noop(
      gramsOM.join(dupHashes.hint("shuffle_hash"), Seq("__h"))))
    val dup = gramsOM.join(dupHashes.hint("shuffle_hash"), Seq("__h"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    time("dup-join+lag")(noop(dup
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(w) === 1, 0L).otherwise(1L))))
    time("dup-join+lag+sum+agg")(noop(dup
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(w) === 1, 0L).otherwise(1L))
      .withColumn("span_id", sum(col("__new")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).cast(LongType).as("start_tok"),
        (max(col("pos")) + (n - 1)).cast(LongType).as("end_tok"))))
    spark.stop()
  }
}
