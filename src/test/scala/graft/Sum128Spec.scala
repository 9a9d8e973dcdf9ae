package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.plans.Sum128ProductAgg.sum128Product

/** Native two-long 128-bit exact SUM(a*b): value-equal to the decimal
  * formulation everywhere the decimal form is exact, null semantics of
  * sum(a*b), partitioning-deterministic, and LOUD (raising) past both
  * overflow boundaries instead of the decimal form's silent NULL. */
class Sum128Spec extends SparkSpec {
  import spark.implicits._

  /** The r13 decimal formulation this aggregate replaced — exact while
    * |sum| < 10^38, the in-suite oracle. */
  private def decimalForm = expr(
    "sum(CAST(a AS DECIMAL(26,0)) * b)")

  test("== decimal form on adversarial magnitudes, signs, nulls") {
    val rng = new scala.util.Random(7)
    val big = Seq(Long.MaxValue, Long.MinValue + 1, 1L << 62, -(1L << 62),
      3037000499L, -3037000499L) // ~sqrt(Long.Max): products straddle 2^63
    val rows = (1 to 6000).map { i =>
      val a: java.lang.Long =
        if (i % 41 == 0) null
        else if (i % 7 == 0) big(i % big.size)
        else rng.nextLong() >> rng.nextInt(40)
      val b: java.lang.Long =
        if (i % 53 == 0) null
        // keep b small enough that the true sum stays well under 10^38
        // (the decimal oracle's exactness bound) while single products
        // still exceed 2^63 routinely
        else (rng.nextLong() >> 45) + 1
      (i % 17, a, b)
    } :+ ((17, null: java.lang.Long, null: java.lang.Long)) // all-null group
    val df = rows.toDF("k", "a", "b")
    val native = df.groupBy($"k").agg(sum128Product($"a", $"b").as("s"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getDecimal(1).toBigInteger)).toMap
    val oracle = df.groupBy($"k").agg(decimalForm.as("s"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) null else r.getDecimal(1).toBigInteger)).toMap
    assert(native === oracle)
    assert(native.values.exists(v =>
      v != null && v.abs.compareTo(
        java.math.BigInteger.valueOf(Long.MaxValue)) > 0),
      "test data must actually exercise sums beyond 2^63")
  }

  test("single products beyond 2^63 are exact (the reason it exists)") {
    // 2^62 * 9: each product 2^62, true sum 9*2^62 = 2^65 + 2^63 —
    // representable in neither a Long product nor a Long sum.
    val df = Seq.fill(9)((1L << 62, 1L)).toDF("a", "b")
    val got = df.agg(sum128Product($"a", $"b")).head.getDecimal(0)
    assert(got.toBigInteger ===
      java.math.BigInteger.valueOf(1L << 62).multiply(
        java.math.BigInteger.valueOf(9)))
  }

  test("partitioning-deterministic: same answer at 1 and 7 partitions") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 3000).map { i =>
      (i % 5, rng.nextLong() >> rng.nextInt(30), (rng.nextLong() >> 44) + 1)
    }
    def run(parts: Int) = rows.toDF("k", "a", "b").repartition(parts)
      .groupBy($"k").agg(sum128Product($"a", $"b").as("s"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    assert(run(1) === run(7))
  }

  test("overflow RAISES: true sum past 2^127 trips the latched flag") {
    // product 2^62 * 2^62 = 2^124; 9 of them = 9 * 2^124 > 2^127.
    val df = Seq.fill(9)((1L << 62, 1L << 62)).toDF("a", "b")
    val e = intercept[SparkException] {
      df.agg(sum128Product($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("128-bit accumulator overflow") ||
      Option(e.getCause).exists(_.getMessage.contains(
        "128-bit accumulator overflow")))
  }

  test("overflow RAISES: sum in (10^38, 2^127) fails the DECIMAL(38,0) gate") {
    // 2 * (9e18)^2 = 1.62e38: under 2^127 (~1.7e38) so the flag stays
    // clear, over 10^38 so the decimal conversion must refuse.
    val df = Seq.fill(2)((9000000000000000000L, 9000000000000000000L))
      .toDF("a", "b")
    val e = intercept[SparkException] {
      df.agg(sum128Product($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("exceeds DECIMAL(38,0)") ||
      Option(e.getCause).exists(_.getMessage.contains(
        "exceeds DECIMAL(38,0)")))
  }

  test("null semantics of sum(a*b): null on either side skips the row") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (2L, 3L), (null, 5L), (7L, null), (null, null)).toDF("a", "b")
    val got = df.agg(sum128Product($"a", $"b")).head.getDecimal(0)
    assert(got.longValueExact() === 6L)
    val empty = Seq[(java.lang.Long, java.lang.Long)](
      (null, 1L), (1L, null)).toDF("a", "b")
    assert(empty.agg(sum128Product($"a", $"b")).head.isNullAt(0))
  }
}
