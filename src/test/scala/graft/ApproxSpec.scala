package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates — the 100 TB substitutes for exact
  * distinct/quantile when cardinalities explode. Exact forms remain the
  * oracle-checked surface (cardinalities there are modest); these
  * verify the approximate forms stay within their error contracts so
  * they can be swapped in at scale. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within rsd of exact on events.user_id") {
    val ev = graft.queries.CoreQueries.t(spark, "/root/testdata/sf0.01", "events")
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.05).as("approx")).head
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.15) // 3x the 5% rsd
  }

  test("approx_percentile brackets the exact percentile") {
    val ev = graft.queries.CoreQueries.t(spark, "/root/testdata/sf0.01", "events")
    val r = ev.agg(
      expr("percentile(value, 0.5)").as("exact"),
      expr("approx_percentile(value, 0.5, 1000)").as("approx")).head
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) / math.max(exact, 1e-9) < 0.05)
  }
}
