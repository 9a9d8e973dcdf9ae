package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The remaining TPC-H decision-support shapes: national market share
  * (Q8), bilateral shipping volume (Q7), disjunctive pushdown predicates
  * (Q19), min-per-group correlated selection (Q2), distinct-count
  * grouping with a NOT-IN exclusion (Q16), nested-aggregate dominance
  * semi-join (Q20), the sole-late-supplier double-correlated
  * EXISTS/NOT-EXISTS (Q21), and priority case-sums (Q12) — adapted to
  * the synthetic schema (no partsupp/comment columns; ship-mode proxied
  * by linestatus, supply relationships derived from lineitem pairs).
  *
  * Determinism: every ratio is two decimal sums surfaced as doubles with
  * one multiply + one divide in mirrored order; every threshold is a
  * decimal (or integer) cross-multiplication; min/max selections compare
  * SOURCE values (no derived floats), so equality is engine-exact.
  */
object DecisionQueries {

  import CoreQueries.t

  private val dec = DecimalType(20, 6)
  private val d2 = DecimalType(18, 2)

  private def volDec: Column =
    (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q8 shape (national market share): of ECONOMY-part revenue
    // sold to region-0 customers, the share supplied by NATION_5, per
    // order year. Fact-fact join shuffles once; part/customer/supplier/
    // nation dims broadcast. The share is a conditional decimal sum over
    // the SAME aggregation pass.
    "q118_tpch_q8" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val nCust = t(s, dir, "nation").filter(col("n_regionkey") === 0)
        .select(col("n_nationkey").as("cn_key"))
      val nSupp = t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_5", volDec)
            .otherwise(lit(0).cast(dec))).cast("double") /
            sum(volDec).cast("double")).as("mkt_share"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q7 shape (bilateral volume shipping): revenue flowing
    // between NATION_1 and NATION_2 in either direction, by supplier
    // nation, customer nation, and ship year.
    "q119_tpch_q7" -> ((s, dir) => {
      val nSupp = t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val nCust = t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      val su = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nCust), col("c_nationkey") === col("cn_key"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
        .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(volDec).cast("double").as("volume"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates): an
    // OR of three brand/size/quantity conjunctions. Catalyst extracts
    // the common l_partkey join and pushes the common part filter; the
    // disjunction evaluates post-join in one codegen stage.
    "q120_tpch_q19" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30)))
        .agg(sum(volDec).cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q2 shape (minimum-cost supplier): for each LARGE size-15
    // part, the supplier(s) with the minimum account balance among
    // suppliers that actually shipped it. The correlated MIN becomes a
    // per-part aggregate joined back on raw-value equality (no derived
    // arithmetic — engine-exact).
    "q121_tpch_q2" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_size") === 15 && col("p_type") === "LARGE")
        .select(col("p_partkey"))
      val pairs = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val j = pairs
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
      val minb = j.groupBy(col("p_partkey").as("mb_pk"))
        .agg(min(col("s_acctbal")).as("min_bal"))
      j.join(minb, col("p_partkey") === col("mb_pk") &&
          col("s_acctbal") === col("min_bal"))
        .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"))
    }),

    // TPC-H Q16 shape (supplier-count by part attributes): distinct
    // suppliers per (brand, type, size) over observed supply pairs,
    // excluding "complaint" suppliers (negative balance) via NOT IN —
    // a broadcast left-anti join.
    "q122_tpch_q16" -> ((s, dir) => {
      val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_sk"))
      val p = t(s, dir, "part")
        .filter(col("p_size").isin(1, 5, 10, 15, 20, 25))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("bad_sk"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q20 shape (excess-share suppliers): suppliers whose shipped
    // quantity of some part exceeds 3x their fair share — a nested
    // aggregate (per part-supplier vs per part) with a decimal
    // cross-multiplied dominance threshold, reduced to a per-supplier
    // dominated-part count.
    "q123_tpch_q20" -> ((s, dir) => {
      // One lineitem scan: the per-part total quantity is the sum of the
      // per-(part,supp) sums and the distinct-supplier count is the row
      // count of that aggregate, so both come from a window over the
      // already-grouped frame — no second scan, no countDistinct expand,
      // no join.
      val ps = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast(d2)).as("sq"))
      val perPart = Window.partitionBy(col("l_partkey"))
      ps.withColumn("tq", sum(col("sq")).over(perPart))
        .withColumn("ns", count(lit(1)).over(perPart))
        .filter(col("sq") * col("ns") > col("tq") * lit(3))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("nparts"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("nparts"))
    }),

    // TPC-H Q21 shape (sole late supplier): suppliers who shipped >100
    // days after the order date, in multi-supplier orders where NO other
    // supplier was that late — EXISTS plus NOT-EXISTS, both correlated
    // on the order AND anti-correlated on the supplier. Expressed as a
    // semi join then an anti join over (order, supplier) projections
    // built from independent scans (distinct lineages keep the
    // self-join conditions real).
    "q124_tpch_q21" -> ((s, dir) => {
      def lateLi(tag: String): DataFrame =
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as(s"ok$tag"), col("l_suppkey").as(s"sk$tag"),
            (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS"))
              .as(s"late$tag"))
      val l1 = lateLi("1").filter(col("late1"))
      val l2 = lateLi("2")
      val l3 = lateLi("3").filter(col("late3"))
      l1.join(l2, col("ok1") === col("ok2") && col("sk1") =!= col("sk2"),
          "left_semi")
        .join(l3, col("ok1") === col("ok3") && col("sk1") =!= col("sk3"),
          "left_anti")
        .groupBy(col("sk1"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier")),
          col("sk1") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // TPC-H Q12 shape (shipping priority classes): per linestatus, how
    // many late-shipped 1997 lineitems belong to high- vs low-priority
    // orders — two conditional integer sums in one pass.
    "q125_tpch_q12" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") > col("o_orderdate"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(hi, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
          sum(when(!hi, lit(1L)).otherwise(lit(0L))).as("low_line_count"))
    }),

    // TPC-H Q9 shape (product-type profit): for parts whose name
    // contains "red", profit per supplier nation and order year, where
    // unit cost is proxied by 10% of retail price (the synthetic schema
    // has no partsupp/ps_supplycost). This completes the full 22-query
    // TPC-H shape coverage. The lineitem⋈orders fact-fact join is the
    // only shuffle; part/supplier/nation broadcast. Revenue and cost are
    // both decimal before the subtraction, so the grouped sums are
    // engine-exact regardless of partitioning.
    "q132_tpch_q9" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_name").contains("red"))
        .select(col("p_partkey"), col("p_retailprice"))
      val n = t(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("sn_key"))
        .groupBy(col("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(volDec -
            (col("p_retailprice") * col("l_quantity") * lit(0.1)).cast(dec))
            .cast("double").as("sum_profit"),
          count(lit(1)).as("n_rows"))
    }))

  val oracle: Map[String, String] = Map(

    "q118_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_5'
        |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))
        |      ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(20,6))) AS DOUBLE) AS DOUBLE) AS mkt_share,
        |  count(*) AS n_rows
        |FROM (
        |  SELECT l_extendedprice, l_discount, o_orderdate,
        |    ns.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  WHERE p_type = 'ECONOMY' AND nc.n_regionkey = 0
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |GROUP BY year(o_orderdate)""".stripMargin,

    "q119_tpch_q7" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6)))
        |    AS DOUBLE) AS volume,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        |   OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
        |GROUP BY ns.n_name, nc.n_name, year(l_shipdate)""".stripMargin,

    "q120_tpch_q19" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6)))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q121_tpch_q2" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |j AS (
        |  SELECT p_partkey, s_suppkey, s_name, s_acctbal
        |  FROM pairs
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE p_size = 15 AND p_type = 'LARGE')
        |SELECT p_partkey, s_suppkey, s_name, s_acctbal
        |FROM j
        |WHERE s_acctbal = (SELECT min(s_acctbal) FROM j j2
        |                   WHERE j2.p_partkey = j.p_partkey)""".stripMargin,

    "q122_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size IN (1, 5, 10, 15, 20, 25)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin,

    "q123_tpch_q20" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |perPart AS (
        |  SELECT l_partkey AS p_pk,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS tq,
        |    count(DISTINCT l_suppkey) AS ns
        |  FROM lineitem GROUP BY l_partkey),
        |dom AS (
        |  SELECT l_suppkey, count(*) AS nparts
        |  FROM ps JOIN perPart ON l_partkey = p_pk
        |  WHERE sq * ns > tq * 3
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, nparts
        |FROM dom JOIN supplier ON l_suppkey = s_suppkey""".stripMargin,

    "q124_tpch_q21" ->
      """WITH li AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    l_shipdate > o_orderdate + INTERVAL 100 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT s_name, numwait FROM (
        |  SELECT sk1 AS sk, count(*) AS numwait FROM (
        |    SELECT l1.ok AS ok1, l1.sk AS sk1
        |    FROM li l1
        |    WHERE l1.late
        |      AND EXISTS (SELECT 1 FROM li l2
        |                  WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
        |      AND NOT EXISTS (SELECT 1 FROM li l3
        |                      WHERE l3.ok = l1.ok AND l3.sk <> l1.sk
        |                        AND l3.late))
        |  GROUP BY sk1)
        |JOIN supplier ON sk = s_suppkey
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q125_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > o_orderdate
        |GROUP BY l_linestatus""".stripMargin,

    "q132_tpch_q9" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))
        |    - CAST(p_retailprice * l_quantity * CAST(0.1 AS DOUBLE)
        |        AS DECIMAL(20,6))) AS DOUBLE) AS sum_profit,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, year(o_orderdate)""".stripMargin)
}
