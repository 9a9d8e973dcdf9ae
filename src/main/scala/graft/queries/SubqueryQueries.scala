package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.exact

/** The TPC-H decision-support subquery family, adapted to the synthetic
  * star schema (no partsupp table; comment/phone columns replaced by
  * derivable attributes). These exercise the relational shapes the plain
  * join/agg surface does not: EXISTS / NOT EXISTS semi-antijoins with
  * correlated extra predicates, correlated scalar aggregates, HAVING
  * against a global scalar, IN over an aggregated subquery, and
  * case-share ratios.
  *
  * Catalyst decorrelates every one of these into joins — the point of
  * expressing them as DataFrame compositions is that the SAME plan shape
  * a SQL user would get from the subquery text is declared directly:
  * semi/anti joins, broadcast 1-row scalar aggregates, and decimal-exact
  * threshold comparisons (cross-multiplied, so no float-compare drift —
  * see graft.functions.exact).
  */
object SubqueryQueries {

  import CoreQueries.t

  private val dec = DecimalType(20, 6)
  private val d2 = DecimalType(18, 2)

  private def discPriceDec: Column =
    (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q4 shape (order-priority checking): orders in a quarter with
    // at least one lineitem shipped after the order date — EXISTS with a
    // correlated inequality, i.e. a left-semi join whose condition spans
    // both sides. The date filter pushes into the orders scan; only the
    // semi join shuffles.
    "q110_tpch_q4" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      o.join(li,
          o("o_orderkey") === li("l_orderkey") &&
            li("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // TPC-H Q13 shape (customer order distribution): LEFT OUTER join
    // with an extra join-side predicate, then a two-level aggregation —
    // the count-of-counts histogram. Customers with zero orders land in
    // the c_count=0 bucket via the null-preserving outer join.
    "q111_tpch_q13" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q17 shape (small-quantity-order revenue): lineitems whose
    // quantity is below 1/5 of their part's average quantity. The
    // correlated AVG becomes a per-part aggregate joined back; the
    // threshold `qty < 0.2 * avg` is cross-multiplied into decimal
    // integers (5 * n * qty < sum_qty) so the comparison is exact on
    // any engine — no derived-float compare.
    "q112_tpch_q17" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#13" && col("p_type") === "SMALL")
        .select(col("p_partkey"))
      val liP = t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val perPart = liP.groupBy(col("l_partkey").as("agg_pk"))
        .agg(sum(col("l_quantity").cast(d2)).as("sum_qty_dec"),
          count(lit(1)).as("n_li"))
      liP.join(perPart, col("l_partkey") === col("agg_pk"))
        .filter(col("l_quantity").cast(d2) * lit(5) * col("n_li") <
          col("sum_qty_dec"))
        .agg(
          (sum(col("l_extendedprice").cast(dec)).cast("double") / lit(7.0))
            .as("avg_yearly"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q18 shape (large-volume customers): orders whose total
    // quantity exceeds a threshold — IN over a grouped-HAVING subquery,
    // here a broadcast join against the qualifying key set. The
    // threshold compare is decimal-exact.
    "q113_tpch_q18" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val big = li.groupBy(col("l_orderkey").as("big_ok"))
        .agg(sum(col("l_quantity").cast(d2)).as("tot_qty_dec"))
        .filter(col("tot_qty_dec") > lit(300))
        .select(col("big_ok"))
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(broadcast(big), col("l_orderkey") === col("big_ok"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_totalprice"))
        .agg(exact.sumExact(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // TPC-H Q22 shape (global sales opportunity): customers above the
    // positive-balance average with no recent urgent orders — a
    // scalar-subquery compare (1-row broadcast) plus NOT EXISTS over a
    // filtered subset (left-anti join; the filter pushes into the
    // orders scan), grouped by a derived country code.
    "q114_tpch_q22" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(exact.avgExact(col("c_acctbal")).as("ab"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("ab"))
        .withColumn("cntry", (col("c_nationkey") % 5).cast("long"))
        .groupBy(col("cntry"))
        .agg(count(lit(1)).as("numcust"),
          exact.sumExact(col("c_acctbal")).as("totacctbal"))
    }),

    // TPC-H Q11 shape (important stock identification): per-part traded
    // value restricted to one supplier region, kept only where the part
    // exceeds 0.1% of the region total. The global total is a 1-row
    // broadcast; the HAVING fraction is cross-multiplied in decimal
    // (value * 1000 > total) — exact, partitioning-independent.
    "q115_tpch_q11" -> ((s, dir) => {
      val su = t(s, dir, "supplier").filter(col("s_nationkey") < 5)
        .select(col("s_suppkey").as("sk"))
      val liS = t(s, dir, "lineitem")
        .join(broadcast(su), col("l_suppkey") === col("sk"))
      val perPart = liS.groupBy(col("l_partkey"))
        .agg(sum(discPriceDec).as("value_dec"))
      val total = perPart.agg(sum(col("value_dec")).as("total_dec"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_dec") * lit(1000) > col("total_dec"))
        .select(col("l_partkey"), col("value_dec").cast("double").as("value"))
    }),

    // TPC-H Q15 shape (top supplier): suppliers whose quarter revenue
    // equals the maximum — the correlated `= (SELECT max(...))` becomes
    // a 1-row broadcast max joined on decimal EQUALITY (exact; a double
    // max would risk last-ulp ties diverging between engines).
    "q116_tpch_q15" -> ((s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(discPriceDec).as("rev_dec"))
      val mx = rev.agg(max(col("rev_dec")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_dec") === col("mx"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_dec").cast("double").as("total_revenue"))
    }),

    // TPC-H Q14 shape (promotion effect): share of a month's revenue
    // from PROMO parts. Both sides of the ratio are decimal sums from
    // the SAME aggregation pass (conditional sum), surfaced as doubles
    // for one multiply + one divide — the only IEEE ops, in the same
    // order on both engines.
    "q117_tpch_q14" -> ((s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_type"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) *
            sum(when(col("p_type") === "PROMO", discPriceDec)
              .otherwise(lit(0).cast(dec))).cast("double") /
            sum(discPriceDec).cast("double")).as("promo_revenue_pct"),
          count(lit(1)).as("n_rows"))
    }))

  val oracle: Map[String, String] = Map(

    "q110_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,

    "q111_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q112_tpch_q17" ->
      """WITH liP AS (
        |  SELECT l.* FROM lineitem l
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#13' AND p_type = 'SMALL'),
        |agg AS (
        |  SELECT l_partkey AS agg_pk,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec,
        |    count(*) AS n_li
        |  FROM liP GROUP BY l_partkey)
        |SELECT
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
        |    / 7.0 AS DOUBLE) AS avg_yearly,
        |  count(*) AS n_rows
        |FROM liP JOIN agg ON l_partkey = agg_pk
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n_li < sum_qty_dec""".stripMargin,

    "q113_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  o_totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d'), o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q114_tpch_q22" ->
      """WITH ab AS (
        |  SELECT CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE)
        |    / count(c_acctbal) AS DOUBLE) AS ab
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntry,
        |  count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) AS totacctbal
        |FROM customer, ab
        |WHERE c_acctbal > ab.ab
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT'
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey % 5""".stripMargin,

    "q115_tpch_q11" ->
      """WITH perPart AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6)))
        |      AS value_dec
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey < 5
        |  GROUP BY l_partkey),
        |total AS (SELECT sum(value_dec) AS total_dec FROM perPart)
        |SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
        |FROM perPart, total
        |WHERE value_dec * 1000 > total_dec""".stripMargin,

    "q116_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6)))
        |      AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)""".stripMargin,

    "q117_tpch_q14" ->
      """SELECT
        |  CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))
        |      ELSE CAST(0 AS DECIMAL(20,6)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(20,6))) AS DOUBLE) AS DOUBLE)
        |    AS promo_revenue_pct,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin)
}
