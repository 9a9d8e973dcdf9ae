ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "satsureagridatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked run's stdout/stderr through verbatim: sbt's default
// LoggedOutput prefixes every line with "[info] ", which breaks any
// consumer that parses Bench/Verify's JSON stdout lines.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
scalacOptions += "-deprecation"
// local[32] runs the whole "cluster" in this one JVM: 32 task threads
// sharing the unified memory region plus the driver. 8g was measured
// GC-bound on the long bench suite (q124: 10 s GC of 14 s wall with
// zero spill), so the default aims for 24g — but clamped to 60% of the
// host's MemAvailable so the forked JVM still STARTS on smaller hosts
// (a hard-pinned 24g Xms bakes in a 128-GiB-host assumption).
// SPARK_DRIVER_MEM overrides the derived value verbatim.
val graftHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val availKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemAvailable:") =>
        l.trim.split("\\s+")(1).toLong }
      .getOrElse(0L)
    catch { case _: Throwable => 0L }
  val gb =
    if (availKb <= 0) 24L // probe failed: keep the old default
    else math.max(2L, math.min(24L, availKb * 6 / 10 >> 20))
  s"${gb}g"
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap",
  // Pin the initial heap to the max: G1 otherwise starts small, and the
  // explicit full GCs between bench queries keep shrinking the heap
  // back, so every heavy query pays repeated expand/evacuate cycles
  // (measured: q158 39 s summed GC with an unpinned 24g heap vs 4.7 s
  // pinned — the resizing, not the ceiling, was the cost).
  s"-Xms$graftHeap",
  "-XX:+UseG1GC",
  // A bench/scale JVM compiles thousands of generated classes (every
  // query's whole-stage codegen, plus the framework); the default
  // 240 MB code cache fills mid-run, flushing triggers, and hot
  // methods of LATER queries run interpreted or re-JIT — measured as
  // uniform in-task slowdown with flat GC (x1000 mad_outliers: 14.4 s
  // fresh JVM vs 19-23 s after neighboring shapes, gc ~1 s). Size the
  // cache so a full suite never flushes.
  "-XX:ReservedCodeCacheSize=512m",
)
