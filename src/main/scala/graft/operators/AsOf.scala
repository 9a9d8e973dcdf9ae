package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.time.epochUs

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Implemented as union + ordered window rather than a custom physical
  * operator: tag both inputs, union them, and per key carry the last
  * right-side row at-or-before each left row with
  * `last(..., ignoreNulls)` over an unbounded-preceding frame. One hash
  * shuffle on the key and a linear per-partition scan — the same cost
  * profile as a sort-merge join, with no range-condition blowup. This
  * is the (a)-tier choice from the custom-operator ladder: built-ins
  * compose to the exact semantics, so no SparkStrategy is needed.
  *
  * Tie rules match DuckDB's ASOF JOIN (`left.ts >= right.ts`): a right
  * row at the same instant matches, and among right rows sharing
  * (key, ts) the one with the greatest tie-break value wins.
  */
object AsOf {

  /** Left as-of join. Returns every left row plus `asof_match` — a
    * struct of the matched right row (null when no right row precedes).
    *
    * @param key         equi-join key column name (both sides)
    * @param ts          event-time column name (both sides)
    * @param rightTie    right-side column breaking exact-ts ties (max wins)
    * @param toleranceUs optional max staleness: a preceding right row
    *                    further than this many microseconds back is
    *                    treated as no match (pandas merge_asof
    *                    `tolerance` semantics) — a post-filter on the
    *                    matched struct, zero extra shuffles
    */
  def asofLeft(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightTie: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val rStruct = struct(right.columns.map(col).toSeq: _*)
    val r = right.select(
      col(key).as("__key"), col(ts).as("__ts"),
      lit(0).as("__side"), col(rightTie).cast("long").as("__tie"),
      rStruct.as("__rval"))
    val rvalType = r.schema("__rval").dataType

    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val l = left.select(
      col(key).as("__key"), col(ts).as("__ts"),
      lit(1).as("__side"), lit(Long.MaxValue).as("__tie"),
      lit(null).cast(rvalType).as("__rval"),
      lStruct.as("__lval"))

    val unioned = r.withColumn("__lval", lit(null).cast(l.schema("__lval").dataType))
      .unionByName(l)

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)

    val matched = unioned
      .withColumn("asof_match", last(col("__rval"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceUs match {
      case Some(tol) => matched.withColumn("asof_match",
        when(epochUs(col("__ts")) -
          epochUs(col("asof_match").getField(ts)) <= tol,
          col("asof_match")))
      case None => matched
    }
    bounded.select(col("__lval.*"), col("asof_match"))
  }
}
