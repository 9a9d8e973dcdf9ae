package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.LongPercentileAgg.longPercentile

/** Native primitive-histogram exact percentile: must replicate Spark's
  * own percentile() — including interpolation — on arbitrary long
  * multisets, because existing DuckDB oracles hash against Spark's
  * result. Dyadic percentiles (0.5/0.25/0.75 — every production call
  * site, via the 2x/4x integer-exact tricks) must match EXACTLY. */
class LongPercentileSpec extends SparkSpec {
  import spark.implicits._

  private def compare(rows: Seq[(Long, Long)], p: Double,
      exact: Boolean): Unit = {
    val df = rows.toDF("k", "v")
    val native = df.groupBy($"k")
      .agg(longPercentile($"v", p).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val builtin = df.groupBy($"k")
      .agg(expr(s"percentile(v, ${p}D)").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native.keySet === builtin.keySet)
    native.foreach { case (k, nv) =>
      val bv = builtin(k)
      if (exact) assert(nv === bv, s"key $k: $nv vs $bv (p=$p)")
      else assert(math.abs(nv - bv) <= 1e-9 * math.max(1.0, math.abs(bv)),
        s"key $k: $nv vs $bv (p=$p)")
    }
  }

  test("long_percentile == percentile on randomized multisets (dyadic p)") {
    val rng = new scala.util.Random(7)
    // duplicates, negatives, zeros, odd AND even group sizes
    val rows = (1 to 4000).map { _ =>
      (rng.nextInt(20).toLong,
        (rng.nextInt(200) - 100).toLong * (if (rng.nextBoolean()) 1 else 1000000))
    } ++ Seq((100L, 5L)) // singleton group
    Seq(0.5, 0.25, 0.75, 0.0, 1.0).foreach(p =>
      compare(rows, p, exact = true))
  }

  test("long_percentile eval fallback (computed child) agrees with the " +
    "bound-column fast path") {
    // Plain columns read zero-boxing off the UnsafeRow; a computed
    // child falls back to Expression.eval — this pins the two paths to
    // each other (the hot call sites all pre-project, so only this
    // test exercises the fallback).
    val rng = new scala.util.Random(13)
    val rows = (1 to 3000).map(_ =>
      (rng.nextInt(15).toLong, rng.nextLong() % 10000))
    val df = rows.toDF("k", "v")
    val viaEval = df.groupBy($"k")
      .agg(longPercentile($"v" * 3 + 1, 0.5).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaFast = df.select($"k", ($"v" * 3 + 1).as("w"))
      .groupBy($"k")
      .agg(longPercentile($"w", 0.5).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaEval === viaFast)
  }

  test("long_percentile tracks percentile on non-dyadic p") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 2000).map(_ =>
      (rng.nextInt(8).toLong, rng.nextLong() % 100000))
    Seq(0.3, 0.9, 0.123).foreach(p => compare(rows, p, exact = false))
  }

  test("long_percentile ignores nulls; all-null group is null") {
    val df = Seq(
      (1L, Some(10L)), (1L, None), (1L, Some(20L)),
      (2L, None)
    ).toDF("k", "v")
    val out = df.groupBy($"k").agg(longPercentile($"v", 0.5).as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(15.0))
    assert(out(2L) === None)
  }

  test("long_percentile plans hash-based and survives a histogram grow") {
    // >1024 distinct values forces at least one buffer grow; the
    // half-sum check (2*median integer) pins the dyadic exactness the
    // production call sites rely on.
    val df = spark.range(100000L).select(
      (col("id") % 4).as("k"), (col("id") * 7 % 99991).as("v"))
    val agg = df.groupBy($"k")
      .agg((longPercentile($"v", 0.5) * 2).cast("long").as("m2x"))
    val builtin = df.groupBy($"k")
      .agg(expr("CAST(2 * percentile(v, 0.5D) AS BIGINT)").as("m2x"))
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      builtin.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
  }

  test("long_percentile rejects non-bigint input at analysis") {
    val df = Seq((1L, 1.5)).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy($"k").agg(longPercentile($"v", 0.5)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("long_percentile") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("long_mad_outlier fusion == the composed three-pass form " +
    "(percentile + broadcast-back + threshold count)") {
    import graft.plans.LongMadOutlierAgg.madOutlierGate
    val rng = new scala.util.Random(23)
    val rows = (1 to 20000).map { i =>
      // heavy ties + a planted outlier tail, several groups
      val base = rng.nextInt(200).toLong * 1000L
      val v = if (rng.nextInt(50) == 0) base + 5000000L else base
      (i % 7, v)
    }
    val dev = rows.toDF("k", "dev2x")
    val fused = dev.groupBy($"k")
      .agg(madOutlierGate($"dev2x").as("m"))
      .select($"k", $"m.mad4x", $"m.n_outliers")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val mad = dev.groupBy($"k")
      .agg(expr("CAST(2 * percentile(dev2x, 0.5D) AS BIGINT)").as("mad4x"))
    val composed = dev.join(broadcast(mad), Seq("k"))
      .groupBy($"k")
      .agg(max($"mad4x").as("mad4x"),
        sum(when(lit(2L) * $"dev2x" > lit(3L) * $"mad4x", 1L)
          .otherwise(0L)).as("n_outliers"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(fused === composed)
  }
}
