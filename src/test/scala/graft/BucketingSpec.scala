package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: writing both sides bucketed on the
  * join key lets the sort-merge join read matching buckets directly —
  * no shuffle exchange at all. This is the 100 TB fact-to-fact join
  * strategy (broadcast covers only small dims). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val li = graft.queries.CoreQueries.t(spark, "/root/testdata/sf0.001", "lineitem")
    val o = graft.queries.CoreQueries.t(spark, "/root/testdata/sf0.001", "orders")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side; the only exchange
      // allowed is the one feeding the final single-key aggregation
      val joinPart = plan.split("SortMergeJoin").last
      assert(plan.contains("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"join inputs shuffled:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
