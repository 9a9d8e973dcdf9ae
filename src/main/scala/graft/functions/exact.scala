package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Cross-engine-deterministic numeric helpers.
  *
  * Floating-point aggregation order differs between engines (and between
  * Spark partial-aggregate plans at different parallelism), so a plain
  * `avg(double)` is not bit-stable. These helpers keep every intermediate
  * exact (decimal sums, integer counts) and perform exactly one IEEE
  * double division at the end — the same value on any engine, any
  * partitioning, any scale. Used by the oracle-checked query surface;
  * the penalty vs a plain double sum is one decimal accumulator per
  * group, still map-side-combined and codegen'd.
  */
object exact {

  private val dec = DecimalType(20, 6)

  /** Exact mean as an aggregate expression: decimal sum -> double / count. */
  def avgExact(c: Column): Column =
    (sum(c.cast(dec)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** Exact mean over a window. */
  def avgExactOver(c: Column, w: WindowSpec): Column =
    (sum(c.cast(dec)).over(w).cast(DoubleType) / count(c).over(w))
      .cast(DoubleType)

  /** Exact decimal sum surfaced as double. */
  def sumExact(c: Column): Column =
    sum(c.cast(dec)).cast(DoubleType)

  /** Percentage in integer basis points: floor(10000 * num / den).
    * Integer in, integer out — no rounding-mode ambiguity. */
  def pctBp(num: Column, den: Column): Column =
    floor(lit(10000.0) * num / den).cast(LongType)
}
