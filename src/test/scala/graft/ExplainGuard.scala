package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan capture for PLANS.md: the guarded semantic-dedup pair
  * join (not part of the oracle query surface, so graft.Explain cannot
  * reach it). Run: sbt "Test/runMain graft.ExplainGuard". */
object ExplainGuard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val guarded = graft.operators.Similarity.semanticDedup(
      emb, "vec_id", "embedding",
      k = 8, iters = 1, threshold = 0.95, maxCellSize = 64)
    println("=== semanticDedup maxCellSize=64 (simple) ===")
    guarded.explain()
    spark.stop()
  }
}
