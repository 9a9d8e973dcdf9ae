package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (bucketed) range joins.
  *
  * Spark has no native range-join operator: a bare
  * `a.join(b, $"pt" >= $"start" && $"pt" <= $"end")` plans as a
  * BroadcastNestedLoopJoin (all-pairs per partition) — quadratic, and
  * a driver OOM the moment neither side is broadcastable. The classic
  * fix (used by DuckDB's IEJoin and Databricks' range-join hint) is
  * banding: quantize the range dimension into fixed-width buckets,
  * equi-join on the bucket id (a plain shuffled hash join that scales
  * linearly with overlap density), then re-check the exact predicate.
  *
  * Both joins here shuffle only `(bucket, key-columns)` and never
  * materialize the cross product, so they survive a 100x scale-up as
  * long as `bucketWidth` is chosen near the median interval length
  * (too narrow: interval rows explode into many buckets; too wide:
  * each bucket degenerates toward all-pairs).
  *
  * Reference point: the reference pipeline's gap detection joins
  * readings against expected hourly ranges
  * (reference src/quality/checks.py time-continuity check); this is
  * the general distributed form of that point-in-range primitive.
  */
object Intervals {

  /** Join point rows to every interval row whose `[startCol, endCol]`
    * (inclusive, long-typed) contains `ptCol` (long-typed).
    *
    * Interval rows are exploded to their covering buckets; each point
    * row carries exactly ONE bucket, so every qualifying
    * (point, interval) pair meets in exactly one bucket — no
    * post-join distinct is needed.
    *
    * Column names must be disjoint between the two inputs (select
    * before calling); the output carries all columns of both.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      ptCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_bucket", floor(col(ptCol) / bucketWidth))
    val iv = intervals
      .withColumn("_bucket",
        explode(sequence(floor(col(startCol) / bucketWidth),
          floor(col(endCol) / bucketWidth))))
    p.join(iv, Seq("_bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Join interval rows of `a` to interval rows of `b` that overlap
    * (`a.start <= b.end && b.start <= a.end`, all inclusive longs).
    *
    * Both sides are exploded to covering buckets, so an overlapping
    * pair can meet in several buckets; the pair is emitted only from
    * its canonical bucket — the first bucket both intervals cover,
    * `max(floor(aStart/w), floor(bStart/w))` — which keeps the output
    * exactly-once WITHOUT a distinct (a distinct would re-shuffle the
    * full join output; the canonical-bucket test is a free filter).
    */
  def overlapJoin(
      a: DataFrame,
      b: DataFrame,
      aStart: String,
      aEnd: String,
      bStart: String,
      bEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ea = a.withColumn("_bucket",
      explode(sequence(floor(col(aStart) / bucketWidth),
        floor(col(aEnd) / bucketWidth))))
    val eb = b.withColumn("_bucket",
      explode(sequence(floor(col(bStart) / bucketWidth),
        floor(col(bEnd) / bucketWidth))))
    ea.join(eb, Seq("_bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("_bucket") === greatest(floor(col(aStart) / bucketWidth),
          floor(col(bStart) / bucketWidth)))
      .drop("_bucket")
  }
}
