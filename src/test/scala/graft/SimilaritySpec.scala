package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Semantic-dedup skew guard (Similarity.semanticDedup maxCellSize):
  * the pair stage is an equi-join on the k-means cell, so one huge cell
  * is the operator's documented failure mode — these tests pin down the
  * two guard tiers (sign sub-bucket, then id-hash salt) with
  * adversarially-shaped cells and assert the candidate-pair bound the
  * scaladoc promises. */
class SimilaritySpec extends SparkSpec {

  private def vecDF(rows: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** Candidate pairs the guarded pair-join would score:
    * Σ over final buckets of n_b·(n_b-1)/2. */
  private def candidatePairs(cells: DataFrame): Long =
    cells.groupBy(col("centroid_id"), col("sub_sign"), col("sub_salt"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(expr("CAST(n * (n - 1) / 2 AS BIGINT)"))).head.getLong(0)

  test("guard with a loose cap is plumbing-identical to no guard") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 200L).map(i =>
      i -> Array.fill(16)(rnd.nextFloat() * 2 - 1))
    val base = Similarity.semanticDedup(
      vecDF(rows), "vec_id", "embedding", k = 4, iters = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val loose = Similarity.semanticDedup(
      vecDF(rows), "vec_id", "embedding", k = 4, iters = 2, threshold = 0.8,
      maxCellSize = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(loose === base)
  }

  test("oversized diverse-sign cell: sign sub-bucket bounds pairs, keeps exact dups") {
    // One k-means cell (k=1) of 512 vectors whose first 4 dimensions
    // encode i%16 as a sign pattern — diverse orthants, so the sign
    // tier alone can split the cell. A spike dimension keeps unrelated
    // vectors dissimilar. Two exact copies planted (copy shares the
    // original's orthant by construction).
    val cap = 40
    def v(i: Long): Array[Float] = {
      val a = Array.fill(16)(0.1f)
      (0 until 4).foreach(b => a(b) = if (((i >> b) & 1L) == 1L) 1f else -1f)
      a(5 + (i % 11).toInt) = 10f
      a
    }
    val originals = (0L until 510L).map(i => i -> v(i))
    val planted = Seq(510L -> v(0L), 511L -> v(1L)) // exact dups of 0 and 1
    val df = vecDF(originals ++ planted)
    val cells = Similarity.cellAssignments(
      df, "vec_id", "embedding", k = 1, iters = 1, maxCellSize = cap)
    // 512/40 -> 4 sign bits -> 16 sub-buckets of ~32: under the cap, so
    // the salt tier stays out (every bucket one salt).
    val buckets = cells.groupBy(col("sub_sign"), col("sub_salt"))
      .agg(count(lit(1)).as("n")).collect()
    assert(buckets.length === 16)
    assert(buckets.map(_.getLong(2)).max <= cap)
    val pairs = candidatePairs(cells)
    assert(pairs <= 512L * cap) // the documented bound
    assert(pairs < 512L * 511 / 2 / 5) // >5x below the unguarded n^2/2
    // Exact duplicates share the sign pattern -> same bucket -> found.
    val dropped = Similarity.semanticDedup(
      df, "vec_id", "embedding", k = 1, iters = 1, threshold = 0.999,
      maxCellSize = cap)
      .filter(col("dropped")).select(col("vid"))
      .collect().map(_.getLong(0)).toSet
    assert(dropped.contains(510L) && dropped.contains(511L))
    // Soundness: the guard can only MISS pairs, never invent them.
    val unguarded = Similarity.semanticDedup(
      df, "vec_id", "embedding", k = 1, iters = 1, threshold = 0.999)
      .filter(col("dropped")).select(col("vid"))
      .collect().map(_.getLong(0)).toSet
    assert(dropped.subsetOf(unguarded))
  }

  test("degenerate same-sign cell: salt tier hard-bounds pairs") {
    // The sign tier's worst case: 300 vectors, ALL in one orthant (all
    // dimensions positive), one cell — sub_sign cannot split anything,
    // so the salt tier must. 100 exact copies each of 3 distinct
    // vectors: within-salt search still collapses copies; survivors are
    // bounded by (#salts x #distinct) instead of #distinct — the
    // documented recall cost of the hard bound.
    val cap = 50
    def v(j: Int): Array[Float] =
      Array.tabulate(16)(d => 0.5f + 0.05f * ((d * (j + 1)) % 7))
    val rows = (0L until 300L).map(i => i -> v((i % 3).toInt))
    val df = vecDF(rows)
    val cells = Similarity.cellAssignments(
      df, "vec_id", "embedding", k = 1, iters = 1, maxCellSize = cap)
    val bySalt = cells.groupBy(col("sub_salt"))
      .agg(count(lit(1)).as("n")).collect()
    assert(bySalt.length === 6) // ceil(300/50) salts
    assert(cells.select(col("sub_sign")).distinct().count() === 1)
    // Hash-uniform salts: no group should be grossly over n/salts.
    assert(bySalt.map(_.getLong(1)).max <= 2L * cap)
    val pairs = candidatePairs(cells)
    assert(pairs <= 300L * cap) // documented: ~n*maxCellSize/2, assert 2x slack
    assert(pairs < 300L * 299 / 2 / 2) // well under unguarded n^2/2
    val survivors = Similarity.semanticDedup(
      df, "vec_id", "embedding", k = 1, iters = 1, threshold = 0.999,
      maxCellSize = cap)
      .filter(!col("dropped")).count()
    // Unguarded keeps exactly 3 (one per distinct vector); guarded
    // keeps at most one per (salt, distinct vector).
    assert(survivors <= 6L * 3)
    assert(survivors >= 3L)
  }
}
