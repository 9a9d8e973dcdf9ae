package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Output-mass-sized repartitioning for fan-out joins that feed a
  * partial aggregate — extracted from the r15 containment rewrite
  * (217.5 → 45.4 s at the 500k-doc deep point, task_exponent 1.50 →
  * 0.873, spill eliminated).
  *
  * The failure mode it fixes: AQE coalesces a join's input exchange by
  * INPUT bytes, but a fan-out join (token index self-join, band-bucket
  * probe, candidate × dimension) emits many rows per input row, so the
  * coalesced partitions each carry a multiple of their input and the
  * partial aggregate running in the join's stage spills. When the
  * join's output row count is knowable up front (Σ df(w)² for an
  * inverted-index self-join — one cheap aggregate over the index), an
  * explicit `repartition(parts, keys)` sized by that OUTPUT mass is
  * the user-specified partitioning AQE respects.
  *
  * Applicability note (PLANS.md §output-mass r16): the other fan-out
  * joins in this repo either aggregate AFTER a pair-dedup barrier that
  * re-exchanges at output size anyway (minhashLsh, dedupAgainst — the
  * `distinct` is its own shuffle, sized by AQE on the distinct's
  * input, which IS the join output), or were measured flat at the deep
  * points (cooc_lift's df-bounded candidate join: te ≈ 1.0, zero
  * spill), so containment remains the one shape whose partial
  * aggregate shares the fan-out join's stage.
  */
object OutputMass {

  /** Repartition `df` on `keys` so that a downstream operator emitting
    * `outputRows` rows of ~`bytesPerRow` bytes lands in ~64 MB
    * partitions — never fewer than the cluster's default parallelism,
    * never more than 4096. */
  def repartitionByOutputMass(
      df: DataFrame,
      outputRows: Long,
      bytesPerRow: Long,
      keys: Column*): DataFrame = {
    val targetBytes = 64L << 20
    val parts = math.max(
      df.sparkSession.sparkContext.defaultParallelism,
      math.min(4096L, outputRows * bytesPerRow / targetBytes + 1L).toInt)
    df.repartition(parts, keys: _*)
  }
}
