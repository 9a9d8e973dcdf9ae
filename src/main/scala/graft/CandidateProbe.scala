package graft

import org.apache.spark.sql.SparkSession

/** Candidate-volume probe runner: prints one JSON line per
  * configuration of [[operators.Dedup.prefixFilterCandidateProfile]]
  * (positional filter off, then on) over a documents parquet — the
  * deterministic adjudicator for what the PPJoin positional filter
  * buys at a given corpus scale (wall-clock A/B at the deep points is
  * GC-weather-noisy; candidate counts are exact).
  *
  * Usage: runMain graft.CandidateProbe <documents.parquet>
  *   [thresholdBp=6000] [shingle=3]
  */
object CandidateProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/root/testdata/sf0.1/documents.parquet")
    val thresholdBp = args.lift(1).map(_.toInt).getOrElse(6000)
    val shingle = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // JSON-escape the interpolated path: a quote or backslash in a
    // caller-supplied path must not produce an invalid artifact line.
    val pathJson = path.replace("\\", "\\\\").replace("\"", "\\\"")
    try {
      val docs = spark.read.parquet(path)
      for (positional <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val row = operators.Dedup.prefixFilterCandidateProfile(
          docs, "doc_id", "text", thresholdBp, shingle, positional).head()
        val sec = math.rint((System.nanoTime() - t0) / 1e7) / 100
        println(s"""{"path":"$pathJson","threshold_bp":$thresholdBp,"shingle":$shingle,"positional":$positional,"n_docs":${row.getLong(0)},"raw_candidates":${row.getLong(4)},"distinct_pairs":${row.getLong(5)},"sec":$sec}""")
      }
    } finally spark.stop()
  }
}
