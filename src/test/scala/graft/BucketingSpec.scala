package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.Bucketed

/** Co-located joins via bucketed storage ([[graft.operators.Bucketed]]):
  * writing both sides bucketed + per-bucket-sorted on the join key lets
  * the sort-merge join read matching buckets directly — no shuffle
  * exchange AND no sort on either side. This is the 100 TB fact-to-fact
  * join strategy (broadcast covers only small dims); the layout must
  * never change answers, so each plan assertion is paired with a
  * result-parity check against the plain (non-bucketed) form.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def li = graft.queries.CoreQueries.t(spark, dir, "lineitem")
  private def ord = graft.queries.CoreQueries.t(spark, dir, "orders")

  test("colocatedJoin over bucketed tables: no exchange, no sort, same rows") {
    val bli = Bucketed.ensure(spark, dir, "lineitem", Seq("l_orderkey"), 8)(li)
    val bo = Bucketed.ensure(spark, dir, "orders", Seq("o_orderkey"), 8)(ord)

    val joined = Bucketed.colocatedJoin(
        bli, bo, bli("l_orderkey") === bo("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
    val got = joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
    // one file per bucket (ensure() repartitions by the bucket
    // expression before writing), so the scan reports the written sort
    // order and the SMJ needs no SortExec either
    assert(!plan.contains("Sort "), s"bucketed join re-sorted:\n$plan")

    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      .collect()
    assert(got.map(_.toString).sorted.toSeq ===
      expected.map(_.toString).sorted.toSeq)
  }

  test("aggregation keyed on bucket columns runs without any exchange") {
    val bli = Bucketed.ensure(spark, dir, "lineitem", Seq("l_orderkey"), 8)(li)
    val agg = bli.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val got = agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucket-keyed agg shuffled:\n$plan")

    val expected = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q")).collect()
    assert(got.map(_.toString).sorted.toSeq ===
      expected.map(_.toString).sorted.toSeq)
  }

  test("append() keeps co-location: the joined plan is still exchange-free") {
    val even = ord.filter(col("o_orderkey") % 2 === 0)
    val odd = ord.filter(col("o_orderkey") % 2 === 1)
    val half = Bucketed.ensure(spark, dir, "orders_inc",
      Seq("o_orderkey"), 8)(even)
    assert(half.count() === even.count())
    val full = Bucketed.append(spark, dir, "orders_inc",
      Seq("o_orderkey"), 8)(odd)
    assert(full.count() === ord.count())

    val bli = Bucketed.ensure(spark, dir, "lineitem", Seq("l_orderkey"), 8)(li)
    val joined = Bucketed.colocatedJoin(
        bli, full, bli("l_orderkey") === full("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
    val got = joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // multi-file buckets re-sort locally, but neither side shuffles
    assert(!plan.contains("Exchange"),
      s"appended bucketed join shuffled:\n$plan")

    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
      .collect()
    assert(got.map(_.toString).sorted.toSeq ===
      expected.map(_.toString).sorted.toSeq)
  }

  test("compactIfNeeded: file count collapses to one per bucket and the " +
    "join plan is sort-free again; under threshold it is a no-op") {
    Bucketed.drop(spark, dir, "orders_cmp", Seq("o_orderkey"), 8)
    val parts = (0 until 4).map(i => ord.filter(col("o_orderkey") % 4 === i))
    Bucketed.ensure(spark, dir, "orders_cmp", Seq("o_orderkey"), 8)(parts.head)
    parts.tail.foreach(p =>
      Bucketed.append(spark, dir, "orders_cmp", Seq("o_orderkey"), 8)(p))
    val name = Bucketed.tableName(dir, "orders_cmp", Seq("o_orderkey"), 8)
    def files(p: java.nio.file.Path) = listStamps(p)
    val basePath = Paths.get(s"${Bucketed.storageRoot}/$name")
    // 4 batches x one file per bucket
    assert(files(basePath).size === 32)

    // under threshold: metadata check only, files untouched
    val before = files(basePath)
    Bucketed.compactIfNeeded(spark, dir, "orders_cmp",
      Seq("o_orderkey"), 8, maxFilesPerBucket = 4)
    assert(files(basePath) === before)

    // past threshold: one rewrite back to a single sorted file per
    // bucket, old generation deleted
    val compacted = Bucketed.compactIfNeeded(spark, dir, "orders_cmp",
      Seq("o_orderkey"), 8, maxFilesPerBucket = 2)
    assert(compacted.count() === ord.count())
    assert(!Files.exists(basePath), "pre-compaction files not removed")
    val gen = scala.util.Using.resource(
      Files.list(Paths.get(Bucketed.storageRoot))) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(_.getFileName.toString.startsWith(s"$name-g")).toSeq
    }
    assert(gen.size === 1)
    assert(files(gen.head).size === 8)

    // skew case: appends that land in ONE bucket must still fire the
    // per-bucket policy — a total-count trigger would be diluted by
    // the 7 buckets that never gained a file
    Bucketed.drop(spark, dir, "orders_skew", Seq("o_orderkey"), 8)
    val hotKey = ord.select(col("o_orderkey")).head.getLong(0)
    Bucketed.ensure(spark, dir, "orders_skew", Seq("o_orderkey"), 8)(ord)
    (1 to 3).foreach(_ => Bucketed.append(spark, dir, "orders_skew",
      Seq("o_orderkey"), 8)(ord.filter(col("o_orderkey") === hotKey)))
    val skewName = Bucketed.tableName(dir, "orders_skew", Seq("o_orderkey"), 8)
    val skewBase = Paths.get(s"${Bucketed.storageRoot}/$skewName")
    assert(files(skewBase).size === 11) // 8 + 3 single-bucket appends
    val skewCompacted = Bucketed.compactIfNeeded(spark, dir, "orders_skew",
      Seq("o_orderkey"), 8, maxFilesPerBucket = 2) // hot bucket has 4 > 2
    assert(!Files.exists(skewBase), "skewed hot bucket did not compact")
    assert(skewCompacted.count() === ord.count() + 3)

    // single-file buckets again => SMJ with no exchange AND no sort
    val bli = Bucketed.ensure(spark, dir, "lineitem", Seq("l_orderkey"), 8)(li)
    val joined = Bucketed.colocatedJoin(
        bli, compacted, bli("l_orderkey") === compacted("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
    val got = joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"compacted join shuffled:\n$plan")
    assert(!plan.contains("Sort "), s"compacted join re-sorted:\n$plan")
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
      .collect()
    assert(got.map(_.toString).sorted.toSeq ===
      expected.map(_.toString).sorted.toSeq)
  }

  test("q198: ensure + append + colocated join stays exchange-free and " +
    "matches the flat-table result") {
    val q = graft.queries.RelationalQueries.queries("q198_bucketed_append")(
      spark, dir)
    val got = q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val fin = plan.split("== Initial Plan ==").head
    // the only exchange is the final small aggregation; the join of the
    // appended table reads co-located buckets directly
    val joins = "SortMergeJoin".r.findAllIn(fin).length
    assert(joins === 1, s"expected one SMJ:\n$fin")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(fin).length
    assert(exchanges <= 1, s"append-then-join shuffled the join inputs:\n$fin")
    assert(!fin.contains("Exchange hashpartitioning(l_orderkey") &&
      !fin.contains("Exchange hashpartitioning(o_orderkey"),
      s"join keys shuffled:\n$fin")

    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        graft.functions.exact.sumExact(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_lineitems"))
      .collect()
    assert(got.map(_.toString).sorted.toSeq ===
      expected.map(_.toString).sorted.toSeq)
  }

  test("q200: multi-append past the policy + compaction — the join is " +
    "exchange-free AND sort-free, and matches the flat-table result") {
    val q = graft.queries.RelationalQueries.queries("q200_bucketed_compact")(
      spark, dir)
    val got = q.collect()
    // three appends over a maxFilesPerBucket=2 policy must have fired
    // the rewrite: the compacted table lives at a generation path and
    // every bucket is ONE sorted file again, so the scan reports sort
    // order and the SMJ needs neither exchange nor sort
    val fin = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("SortMergeJoin".r.findAllIn(fin).length === 1,
      s"expected one SMJ:\n$fin")
    assert(!fin.contains("Exchange hashpartitioning(l_orderkey") &&
      !fin.contains("Exchange hashpartitioning(o_orderkey"),
      s"join keys shuffled after compaction:\n$fin")
    assert(!fin.contains("Sort "),
      s"post-compaction join re-sorted (single-file sort-order lost):\n$fin")
    // compaction actually happened: the catalog location moved to a
    // generation path
    val loc = spark.sql(
      s"DESCRIBE TABLE EXTENDED `${Bucketed.tableName(
        dir, "lineitem_cmp", Seq("l_orderkey"),
        Bucketed.bucketCountFor(
          new java.io.File(s"$dir/lineitem.parquet").length))}`")
      .filter(col("col_name") === "Location")
      .select("data_type").head.getString(0)
    assert(loc.contains("-g"), s"compaction did not rewrite: $loc")

    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        graft.functions.exact.sumExact(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n_lineitems"))
      .collect()
    assert(got.map(_.toString).sorted.toSeq ===
      expected.map(_.toString).sorted.toSeq)
  }

  test("mismatched bucket counts coalesce in the join instead of shuffling") {
    val bli = Bucketed.ensure(spark, dir, "lineitem", Seq("l_orderkey"), 16)(li)
    val bo = Bucketed.ensure(spark, dir, "orders", Seq("o_orderkey"), 8)(ord)

    val joined = Bucketed.colocatedJoin(
        bli, bo, bli("l_orderkey") === bo("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
    val got = joined.collect()
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // the 16-bucket side is read as 8 coalesced buckets (2 files per
    // task); neither side shuffles — only the coalesced side may sort
    assert(!plan.contains("Exchange"),
      s"mismatched-bucket join shuffled:\n$plan")
    assert(plan.contains("SelectedBucketsCount: 16 out of 16 (Coalesced to 8)"),
      s"wider side not coalesced:\n$plan")

    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
      .collect()
    assert(got.map(_.toString).sorted.toSeq ===
      expected.map(_.toString).sorted.toSeq)
  }

  test("ensure() memoizes: the second call does not rewrite the files") {
    Bucketed.ensure(spark, dir, "orders", Seq("o_orderkey"), 8)(ord)
    val name = Bucketed.tableName(dir, "orders", Seq("o_orderkey"), 8)
    val path = Paths.get(s"${Bucketed.storageRoot}/$name")
    val stampsBefore = listStamps(path)
    assert(stampsBefore.nonEmpty)

    Bucketed.ensure(spark, dir, "orders", Seq("o_orderkey"), 8)(
      fail("memoized ensure() must not re-evaluate the source"))
    assert(listStamps(path) === stampsBefore)
  }

  private def listStamps(p: java.nio.file.Path): Seq[(String, Long, Long)] =
    scala.util.Using.resource(Files.walk(p)) { st =>
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(q => q.toString.endsWith(".parquet"))
        .map(q => (q.getFileName.toString, Files.size(q),
          Files.getLastModifiedTime(q).toMillis))
        .toSeq.sortBy(_._1)
    }
}
